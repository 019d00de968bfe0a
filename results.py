#!/usr/bin/env python3
"""
Aggregate and plot manipulation-classification results from JSON training logs:
boxplots of accuracy per experiment, PSNR/accuracy scatter, progress curves,
confusion matrices (txt/tex/csv) and raw DataFrames.
Parity with the reference results.py.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description='Aggregate manipulation results')
    parser.add_argument('plot', choices=['boxplot', 'scatter', 'progress', 'confusion',
                                         'df', 'auto'])
    parser.add_argument('--dir', dest='root_dir', default='./data/m')
    parser.add_argument('--nip', nargs='*', default=None, help='NIP classes to include')
    parser.add_argument('--cam', nargs='*', default=None, help='cameras to include')
    parser.add_argument('--fmt', default='txt', choices=['txt', 'tex', 'csv'],
                        help='confusion output format')
    parser.add_argument('--run', type=int, default=0, help='repetition for confusion')
    parser.add_argument('--out', default=None, help='output figure path')
    args = parser.parse_args()

    from neural_imaging_tpu.utils import plots, results_data

    if args.plot == 'df' or args.plot == 'auto':
        df = results_data.manipulation_summary(args.root_dir)
        print(df.to_string(index=False))
        return

    if args.plot == 'confusion':
        confusion = results_data.confusion_data(run=args.run, root_dir=args.root_dir)
        if not confusion:
            print(f'No confusion matrices found under {args.root_dir}')
            return
        for key, entry in confusion.items():
            print(f'\n## {key}')
            print(results_data.confusion_to_text(100 * np.asarray(entry['data']),
                                                 entry['labels'], title=key,
                                                 fmt=args.fmt))
        return

    df = results_data.manipulation_metrics(args.nip, args.cam, root_dir=args.root_dir)
    if df.empty:
        print(f'No results found under {args.root_dir}')
        return

    if args.plot == 'boxplot':
        fig, axes = plots.sub(1, figwidth=10)
        groups = df.groupby(['nip', 'ln'])['accuracy']
        labels, series = zip(*[(f'{k[0]}/{k[1]}', list(v)) for k, v in groups])
        axes[0].boxplot(series, tick_labels=labels)
        axes[0].set_ylabel('FAN accuracy')
        axes[0].tick_params(axis='x', rotation=45)
    elif args.plot == 'scatter':
        fig, axes = plots.sub(1, figwidth=8)
        for nip, sel in df.groupby('nip'):
            axes[0].plot(sel['psnr'], sel['accuracy'], 'o', alpha=0.6, label=nip)
        axes[0].set_xlabel('NIP PSNR [dB]')
        axes[0].set_ylabel('FAN accuracy')
        axes[0].legend()
    elif args.plot == 'progress':
        cases = [(cam, nip, f'{ln}/{lc}', 0)
                 for cam in (args.cam or df['camera'].unique())
                 for nip in (args.nip or df['nip'].unique())
                 for ln in ['ln-0.1000', 'fixed-nip']
                 for lc in ['fixed-codec', 'lc-0.1000']
                 if os.path.isdir(os.path.join(args.root_dir, cam, nip, ln, lc))]
        progress, labels = results_data.manipulation_progress(cases, root_dir=args.root_dir)
        fig, axes = plots.sub(1, figwidth=10)
        for label, (_, sel) in zip(labels, progress.groupby(['camera', 'nip', 'exp'])):
            axes[0].plot(sel['step'], sel['accuracy'], label=label)
        axes[0].set_xlabel('validation step')
        axes[0].set_ylabel('FAN accuracy')
        axes[0].legend(fontsize=7)

    out = args.out or f'results_{args.plot}.png'
    plots.save_figure(fig, out)
    print(f'figure -> {out}')


if __name__ == '__main__':
    main()
