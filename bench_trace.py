#!/usr/bin/env python3
"""
Hardware-trace confirmation of the flagship step's roofline position.

The roofline analysis in docs/benchmarks.md originally rested on XLA's
*logical* byte counts (profiling.hlo_traffic / step_cost). This script closes
the loop with a real device profile: it captures a jax.profiler trace of the
EXACT benched step (bench.build_flow_and_batches) and runs xprof's
roofline_model tool over the xplane, which reports MEASURED per-op and
program-level flop rates, HBM/VMEM bandwidths, DMA stalls and bound-by
classifications from the device trace. The compact summary (program row,
top ops, logical-vs-measured bytes) is written to docs/trace_confirmation.json.

Run this ALONE on the chip — a concurrent TPU process interleaves its programs
into the same trace window and distorts wall-derived rates (per-op averages
stay valid; program totals do not).

Usage: python bench_trace.py [--steps 30] [--out docs/trace_confirmation.json]
"""
import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench


def capture_trace(flow, bx, by, steps, log_dir):
    import jax
    for _ in range(bench.WARMUP):
        loss, _ = flow.training_step(bx, by, lambda_nip=0.1, learning_rate=1e-4)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    jax.profiler.start_trace(log_dir)
    for _ in range(steps):
        loss, _ = flow.training_step(bx, by, lambda_nip=0.1, learning_rate=1e-4)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    return time.perf_counter() - t0


def tool_json(log_dir, tool):
    """Run one xprof conversion tool over the captured xplane."""
    from xprof.convert import raw_to_tool_data
    paths = sorted(glob.glob(os.path.join(log_dir, 'plugins', 'profile', '*',
                                          '*.xplane.pb')))
    if not paths:
        raise FileNotFoundError(f'no xplane.pb under {log_dir}')
    data, _ = raw_to_tool_data.xspace_to_tool_data([paths[-1]], tool, {})
    if isinstance(data, bytes):
        data = data.decode()
    return json.loads(data)


_OP_FIELDS = ('step', 'category', 'operation', 'occurrences', 'total_time', 'avg_time',
              'total_self_time_percent', 'dma_stall_percent',
              'measured_flop_rate', 'hbm_bw', 'vmem_read_bw', 'vmem_write_bw',
              'operational_intensity', 'bound_by', 'roofline_efficiency',
              'compute_efficiency', 'max_mem_bw_utilization', 'hlo_module_id',
              'source_info')


def summarize_roofline(tables, steps, top=25):
    """Parse xprof's roofline_model DataTable into a compact dict:
    chip peaks, the whole-program row, and the top ops by self time."""
    table = tables[0]
    peaks = table.get('p', {})
    cols = [c['id'] for c in table['cols']]
    idx = {c: i for i, c in enumerate(cols)}

    def record(row):
        vals = [cell.get('v') for cell in row['c']]
        rec = {f: vals[idx[f]] for f in _OP_FIELDS if f in idx}
        src = rec.get('source_info') or ''
        if '>' in src:  # strip the html wrapper xprof emits
            import re
            rec['source_info'] = re.sub(r'<[^>]*>', '', src)
        return rec

    programs, all_ops = [], []
    for row in table['rows']:
        rec = record(row)
        if rec.get('step') not in (None, 'Total'):
            continue  # keep only the all-steps aggregate rows
        if rec.get('category') == 'Program':
            programs.append(rec)
        elif rec.get('total_time'):
            all_ops.append(rec)
    # several modules can appear (e.g. another process's programs, helper
    # programs like device_put) — analyze the dominant one, and restrict the
    # op rows to it so percentages are internally consistent
    program = max(programs, key=lambda p: p.get('total_time') or 0) \
        if programs else None
    module = None
    if all_ops:
        import collections
        by_module = collections.Counter()
        for o in all_ops:
            by_module[o.get('hlo_module_id')] += o.get('total_time') or 0
        module = by_module.most_common(1)[0][0]
    ops = [o for o in all_ops if o.get('hlo_module_id') == module]
    ops.sort(key=lambda r: -(r.get('total_time') or 0))

    out = {'chip': {k: peaks.get(k) for k in
                    ('device_type', 'peak_flop_rate', 'peak_hbm_bw',
                     'peak_vmem_read_bw', 'peak_vmem_write_bw',
                     'hbm_ridge_point')},
           'program': program,
           'dominant_module': module,
           'module_self_us_per_step': round(sum(o.get('total_time') or 0
                                                for o in ops) / steps, 1),
           'top_ops': ops[:top]}
    if program and program.get('total_time'):
        out['device_us_per_step'] = program['total_time'] / steps
        out['device_steps_per_sec'] = 1e6 / out['device_us_per_step']
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=30)
    ap.add_argument('--log-dir', default='/tmp/ni_tpu_trace_bench')
    ap.add_argument('--out', default='docs/trace_confirmation.json')
    args = ap.parse_args()

    import jax
    flow, bx, by = bench.build_flow_and_batches()
    wall = capture_trace(flow, bx, by, args.steps, args.log_dir)
    steps_per_sec = args.steps / wall
    print(f'traced {args.steps} steps: {steps_per_sec:.2f} steps/s (wall, incl. '
          'trace overhead)')

    summary = {'steps': args.steps, 'wall_steps_per_sec': round(steps_per_sec, 2),
               'device_kind': jax.devices()[0].device_kind}

    try:
        summary['roofline'] = summarize_roofline(
            tool_json(args.log_dir, 'roofline_model'), args.steps)
    except Exception as e:
        summary['roofline_error'] = f'{type(e).__name__}: {e}'

    # logical-side numbers for the SAME compiled step, for the measured-vs-
    # logical bytes comparison
    try:
        import jax.numpy as jnp
        from neural_imaging_tpu.utils import profiling
        step = flow._jitted[('train', False, True)]
        cost = profiling.step_cost(
            step, flow._train_partition(flow.params),
            flow._frozen_partition(flow.params), flow.opt_state, flow._key,
            bx, by, jnp.float32(0.1), jnp.float32(0.0), jnp.float32(1e-4))
        summary['logical'] = {'flops_per_step': cost['flops'],
                              'bytes_accessed_per_step': cost['bytes_accessed']}
        prog = summary.get('roofline', {}).get('program') or {}
        us = summary.get('roofline', {}).get('device_us_per_step')
        if us and prog.get('hbm_bw') is not None:
            measured_hbm_bytes = prog['hbm_bw'] * 1e9 * us * 1e-6  # GB/s * s
            summary['measured_vs_logical'] = {
                'measured_hbm_bytes_per_step': round(measured_hbm_bytes),
                'logical_bytes_per_step': cost['bytes_accessed'],
                'logical_overcount_factor': round(
                    cost['bytes_accessed'] / measured_hbm_bytes, 2),
                'measured_hbm_util': round(
                    prog['hbm_bw'] / float(summary['roofline']['chip']
                                           ['peak_hbm_bw']), 4),
                'measured_mfu': prog.get('compute_efficiency'),
                'roofline_efficiency': prog.get('roofline_efficiency'),
                'bound_by': prog.get('bound_by'),
            }
    except Exception as e:
        summary['logical_error'] = f'{type(e).__name__}: {e}'

    with open(args.out, 'w') as f:
        json.dump(summary, f, indent=2, default=str)
    print(f'wrote {args.out}')
    if 'measured_vs_logical' in summary:
        print(json.dumps(summary['measured_vs_logical'], indent=2))


if __name__ == '__main__':
    main()
