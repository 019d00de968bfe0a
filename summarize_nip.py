#!/usr/bin/env python3
"""
Summarize NIP training statistics across cameras and pipelines
(parity with the reference summarize_nip.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser(description='NIP training stats table')
    parser.add_argument('--dir', dest='dirname', default='./data/models/nip')
    parser.add_argument('--n', type=int, default=1, help='average over last n validations')
    args = parser.parse_args()

    from neural_imaging_tpu.utils import results_data
    df = results_data.nip_stats(args.dirname, avg_last_n_runs=args.n)
    if df.empty:
        print(f'No trained NIP models found under {args.dirname}')
        return
    print(df.to_string(index=False))


if __name__ == '__main__':
    main()
