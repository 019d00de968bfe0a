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

    if args.plot == 'df':
        df = results_data.manipulation_summary(args.root_dir)
        print(df.to_string(index=False))
        return

    if args.plot == 'auto':
        # Scenario guessing (ref results.py:168-224): split the scenario path into
        # components, name each by content, pick the most varied one as the x-axis
        # and map the remaining multi-valued components to plot facets.
        import re

        df = results_data.manipulation_summary(args.root_dir).sort_values('scenario')
        if df.empty:
            print(f'No results found under {args.root_dir}')
            return
        components = df['scenario'].str.split('/', expand=True)
        names = {}
        for i in components.columns:
            values = components[i].astype(str)
            first = values.iloc[0]
            if first.endswith('Net') or first == 'ClassicISP':
                names[i] = 'nip'
            elif first.startswith('ln-'):
                names[i] = 'nip reg.'
            elif first.startswith('lc-'):
                names[i] = 'dcn reg.'
            elif all(v.endswith('c') and v[:-1].isdigit() for v in values.unique()):
                names[i] = 'dcn'
            elif all(re.match(r'^[0-9]{2,3}$', v) for v in values.unique()):
                names[i] = 'jpeg'
            else:
                names[i] = f'scenario:{i}'
            df[names[i]] = values

        uniques = [df[names[i]].nunique() for i in components.columns]
        x_feature = int(np.argmax(uniques))
        mapping = {}
        for target, i in zip(['hue', 'col'],
                             [i for i in components.columns
                              if i != x_feature and df[names[i]].nunique() > 1]):
            mapping[target] = names[i]

        import seaborn as sns
        grid = sns.catplot(x=names[x_feature], y='accuracy', data=df, kind='box',
                           **mapping)
        out = args.out or 'results_auto.png'
        grid.savefig(out)
        print(f'figure -> {out}')

        gb = df.groupby('scenario')
        counts = gb.size().to_frame(name='reps')
        numeric = df.select_dtypes('number').columns
        print(counts.join(gb[list(numeric)].mean()).reset_index().to_string())
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
