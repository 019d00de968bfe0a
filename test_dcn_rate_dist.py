#!/usr/bin/env python3
"""
Multi-codec rate-distortion comparison plots from cached CSV sweeps
(parity with the reference test_dcn_rate_dist.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax()


def main():
    parser = argparse.ArgumentParser(description='Rate-distortion comparison')
    parser.add_argument('--data', required=True, help='directory with benchmark images')
    parser.add_argument('--dcn-models', default='./data/models/dcn',
                        help='root with trained DCN models')
    parser.add_argument('--metric', default='ssim', choices=['ssim', 'psnr', 'msssim_db'])
    parser.add_argument('--force', action='store_true', help='recompute cached CSVs')
    parser.add_argument('--bulk', action='store_true', help='per-image grid instead of one plot')
    parser.add_argument('--out', default='rd_comparison.png')
    args = parser.parse_args()

    from neural_imaging_tpu.compression import ratedistortion as rd
    from neural_imaging_tpu.utils import plots

    dfs = [rd.get_jpeg_df(args.data, force_calc=args.force),
           rd.get_jpeg2k_df(args.data, force_calc=args.force),
           rd.get_bpg_df(args.data, force_calc=args.force),
           # beyond-reference legs (the reference stops at JPEG/J2K/BPG):
           rd.get_webp_df(args.data, force_calc=args.force),
           rd.get_avif_df(args.data, force_calc=args.force)]
    if os.path.isdir(args.dcn_models):
        dfs.append(rd.get_dcn_df(args.data, args.dcn_models, force_calc=args.force))

    if args.bulk:
        fig = rd.plot_bulk(dfs, metric=args.metric)
    else:
        ax = rd.plot_curve(dfs, metric=args.metric, title=os.path.basename(args.data))
        fig = ax.figure
    plots.save_figure(fig, args.out)
    print(f'figure -> {args.out}')


if __name__ == '__main__':
    main()
