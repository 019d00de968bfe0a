"""
Rate-distortion benchmarking: per-image R/D DataFrames for JPEG / JPEG 2000 / BPG /
learned DCN codecs, CSV caching next to the data, parametric curve fits and
comparison plots.

Capability parity with reference compression/ratedistortion.py: the same DataFrame
columns (image_id, filename, codec, quality, ssim, psnr, msssim_db, bytes, bpp) and
the same fit families (logistic in log-bpp for SSIM, log-linear for PSNR). JPEG 2000
goes through OpenJPEG via OpenCV (the reference used glymur + jpylyzer); BPG is
gated on the bpgenc/bpgdec binaries. Beyond the reference's codec set, WebP
(VP8 intra) and AVIF (AV1 intra — the modern successor of BPG's HEVC intra)
legs run through Pillow when its codecs are present.
"""
import io
import os
from pathlib import Path

import imageio.v2 as imageio
import numpy as np
import pandas as pd
from scipy.optimize import curve_fit

from neural_imaging_tpu.compression import bpg_helpers, jpeg_helpers
from neural_imaging_tpu.utils import metrics
from neural_imaging_tpu.utils.utils import logger

RD_COLUMNS = ['image_id', 'filename', 'codec', 'quality', 'ssim', 'psnr',
              'msssim_db', 'bytes', 'bpp']


def _sweep_files(directory, files=None):
    return files or sorted(f for f in os.listdir(directory)
                           if f.lower().endswith(('.png', '.bmp', '.ppm')))


def _load_images(directory, files=None):
    files = _sweep_files(directory, files)
    images = []
    for f in files:
        img = imageio.imread(os.path.join(directory, f))
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        images.append(img[..., :3].astype(np.float32) / 255.0)
    return files, images


def _msssim_db(a, b):
    """MS-SSIM in dB: -10 log10(1 - msssim)."""
    import jax.numpy as jnp
    from neural_imaging_tpu.ops import ssim as ssim_ops
    v = float(ssim_ops.ms_ssim(jnp.asarray(a[None]), jnp.asarray(b[None]))[0])
    return -10.0 * np.log10(max(1.0 - v, 1e-9))


def _row(image_id, filename, codec, quality, original, decoded, nbytes):
    h, w = original.shape[:2]
    return {
        'image_id': image_id, 'filename': filename, 'codec': codec, 'quality': quality,
        'ssim': metrics.ssim(original, decoded),
        'psnr': metrics.psnr(original, decoded),
        'msssim_db': _msssim_db(original, decoded),
        'bytes': nbytes, 'bpp': 8.0 * nbytes / (h * w),
    }


def _maybe_write(directory, codec, filename, quality, decoded, write):
    """Optionally persist a decoded image under <directory>/<codec>/ so sweeps
    can be inspected visually (the reference writes decoded outputs alongside
    its R/D tables, ref compression/ratedistortion.py)."""
    if not write:
        return
    out_dir = os.path.join(directory, codec)
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(filename))[0]
    u8 = (np.clip(decoded, 0.0, 1.0) * 255).round().astype(np.uint8)
    imageio.imwrite(os.path.join(out_dir, f'{stem}_q{quality}.png'), u8)


def _cached(df_fn, directory, cache_name, force=False, qualities=None, files=None):
    """CSV-cache a sweep. The cache is only reused when it covers the *same*
    sweep — identical quality set and identical file set — otherwise a stale
    CSV from an earlier call with different arguments would be returned
    silently."""
    cache = os.path.join(directory, cache_name)
    if os.path.isfile(cache) and not force:
        df = pd.read_csv(cache)
        stale = []
        if qualities is not None and not df.empty:
            want = {float(q) for q in qualities}
            have = {float(q) for q in df['quality'].unique()}
            if want != have:
                stale.append(f'qualities {sorted(have)} != requested {sorted(want)}')
        if not df.empty:
            want_files = set(_sweep_files(directory, files))
            have_files = set(df['filename'].unique())
            if want_files != have_files:
                stale.append('file set changed')
        if not stale:
            logger.info('R/D cache hit: %s', cache)
            return df
        logger.info('R/D cache %s is stale (%s) — rebuilding', cache,
                    '; '.join(stale))
    df = df_fn()
    df.to_csv(cache, index=False)
    return df


def get_jpeg_df(directory, write_files=False, effective_bytes=True, force_calc=False,
                files=None, qualities=range(10, 96, 5)):
    """JPEG R/D sweep over a directory of images (libjpeg, 4:4:4)."""
    def build():
        names, images = _load_images(directory, files)
        rows = []
        for i, (name, img) in enumerate(zip(names, images)):
            for q in qualities:
                decoded, nbytes = jpeg_helpers.compress_batch(
                    img, q, effective=effective_bytes)
                rows.append(_row(i, name, 'jpeg', q, img, decoded, nbytes))
                _maybe_write(directory, 'jpeg', name, q, decoded, write_files)
        return pd.DataFrame(rows, columns=RD_COLUMNS)
    return _cached(build, directory, 'jpeg.csv', force_calc,
                   qualities=qualities, files=files)


def get_jpeg2k_df(directory, write_files=False, effective_bytes=True, force_calc=False,
                  files=None, qualities=tuple(range(25, 46))):
    """JPEG 2000 R/D sweep via OpenJPEG: PSNR-targeted encoding (the reference's
    glymur ``psnr=[q]`` levels 25-45 dB, ratedistortion.py:87-162) with effective
    payload bytes measured from the codestream tile-parts (jpylyzer parity)."""
    from neural_imaging_tpu.compression import jp2_helpers

    def build():
        names, images = _load_images(directory, files)
        rows = []
        for i, (name, img) in enumerate(zip(names, images)):
            u8 = (img * 255).round().astype(np.uint8)
            for q in qualities:
                buf, decoded = jp2_helpers.encode_jp2(u8, psnr_target=float(q))
                nbytes = (jp2_helpers.jp2_payload_bytes(buf) if effective_bytes
                          else len(buf))
                rows.append(_row(i, name, 'jpeg2000', q, img, decoded, nbytes))
                _maybe_write(directory, 'jpeg2000', name, q, decoded, write_files)
        return pd.DataFrame(rows, columns=RD_COLUMNS)
    return _cached(build, directory, 'jpeg2000.csv', force_calc,
                   qualities=qualities, files=files)


def get_bpg_df(directory, write_files=False, force_calc=False, files=None,
               qualities=range(15, 48, 3)):
    """BPG R/D sweep (requires bpgenc/bpgdec; returns empty DataFrame otherwise)."""
    if not bpg_helpers.bpg_available():
        logger.warning('bpgenc/bpgdec unavailable — skipping the BPG sweep')
        return pd.DataFrame(columns=RD_COLUMNS)
    def build():
        names, images = _load_images(directory, files)
        rows = []
        for i, (name, img) in enumerate(zip(names, images)):
            for q in qualities:
                decoded, bpp = bpg_helpers.roundtrip(img, q)
                nbytes = int(bpp * img.shape[0] * img.shape[1] / 8)
                rows.append(_row(i, name, 'bpg', q, img, decoded, nbytes))
                _maybe_write(directory, 'bpg', name, q, decoded, write_files)
        return pd.DataFrame(rows, columns=RD_COLUMNS)
    return _cached(build, directory, 'bpg.csv', force_calc,
                   qualities=qualities, files=files)


def _pil_feature(name):
    try:
        from PIL import features
        return bool(features.check(name))
    except Exception:
        return False


def _pil_roundtrip(img_u8, fmt, **save_kw):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, fmt, **save_kw)
    nbytes = buf.tell()
    buf.seek(0)
    decoded = np.asarray(Image.open(buf).convert('RGB'), np.float32) / 255.0
    return decoded, nbytes


def get_webp_df(directory, write_files=False, force_calc=False, files=None,
                qualities=range(10, 96, 5)):
    """WebP (VP8 intra) R/D sweep via Pillow/libwebp — a beyond-reference leg:
    the reference benchmarks JPEG/JPEG2000/BPG only (ref
    compression/ratedistortion.py:23-235). Empty DataFrame when Pillow lacks
    WebP support (mirrors the BPG gating)."""
    if not _pil_feature('webp'):
        logger.warning('Pillow has no WebP support — skipping the WebP sweep')
        return pd.DataFrame(columns=RD_COLUMNS)

    def build():
        names, images = _load_images(directory, files)
        rows = []
        for i, (name, img) in enumerate(zip(names, images)):
            u8 = (img * 255).round().astype(np.uint8)
            for q in qualities:
                decoded, nbytes = _pil_roundtrip(u8, 'WEBP', quality=int(q),
                                                 method=4)
                rows.append(_row(i, name, 'webp', q, img, decoded, nbytes))
                _maybe_write(directory, 'webp', name, q, decoded, write_files)
        return pd.DataFrame(rows, columns=RD_COLUMNS)
    return _cached(build, directory, 'webp.csv', force_calc,
                   qualities=qualities, files=files)


def get_avif_df(directory, write_files=False, force_calc=False, files=None,
                qualities=range(10, 96, 5)):
    """AVIF (AV1 intra) R/D sweep via Pillow — the modern stand-in for the
    reference's BPG leg (HEVC intra, ref compression/ratedistortion.py:165-235):
    the bpgenc/bpgdec binaries are absent in this environment, and AV1 intra is
    the same codec class a generation newer. Empty DataFrame when Pillow lacks
    AVIF support."""
    if not _pil_feature('avif'):
        logger.warning('Pillow has no AVIF support — skipping the AVIF sweep')
        return pd.DataFrame(columns=RD_COLUMNS)

    def build():
        names, images = _load_images(directory, files)
        rows = []
        for i, (name, img) in enumerate(zip(names, images)):
            u8 = (img * 255).round().astype(np.uint8)
            for q in qualities:
                decoded, nbytes = _pil_roundtrip(u8, 'AVIF', quality=int(q),
                                                 speed=6)
                rows.append(_row(i, name, 'avif', q, img, decoded, nbytes))
                _maybe_write(directory, 'avif', name, q, decoded, write_files)
        return pd.DataFrame(rows, columns=RD_COLUMNS)
    return _cached(build, directory, 'avif.csv', force_calc,
                   qualities=qualities, files=files)


def get_dcn_df(directory, model_directory, write_files=False, force_calc=False,
               files=None):
    """Learned-codec R/D: discovers all trained DCN models (**/progress.json) under
    model_directory and runs the real bitstream round trip on each image."""
    from neural_imaging_tpu.compression import codec as codec_mod

    def build():
        names, images = _load_images(directory, files)
        model_dirs = sorted({str(p.parent) for p in
                             Path(model_directory).glob('**/progress.json')})
        rows = []
        for mdir in model_dirs:
            try:
                dcn = codec_mod.restore(mdir, patch_size=None)
            except Exception as e:
                logger.warning('could not restore %s: %s', mdir, e)
                continue
            code = dcn.model_code
            for i, (name, img) in enumerate(zip(names, images)):
                h = (img.shape[0] // 8) * 8
                w = (img.shape[1] // 8) * 8
                crop = img[:h, :w]
                decoded, nbytes = codec_mod.simulate_compression(crop[None], dcn)
                rows.append(_row(i, name, code, np.nan, crop, decoded[0], nbytes))
                _maybe_write(directory, code, name, 'dcn', decoded[0], write_files)
        return pd.DataFrame(rows, columns=RD_COLUMNS)
    return _cached(build, directory, 'dcn.csv', force_calc, files=files)


# ------------------------------------------------------------------------------------
# Curve fitting + plotting
# ------------------------------------------------------------------------------------

def fit_logistic(bpp, quality, sigma=None):
    """SSIM-style fit: logistic curve in log(bpp). Lower-quality samples are
    down-weighted via sigma = |1 - y| (the reference's weighting,
    ratedistortion.py:473-477)."""
    def fn(x, a, b, c, d):
        return a / (1 + np.exp(-b * (np.log(x) - c))) + d
    popt, _ = curve_fit(fn, bpp, quality, p0=(0.5, 2.0, -1.0, 0.5), maxfev=20000,
                        bounds=([0, 0.1, -5, 0], [1, 20, 5, 1]), sigma=sigma)
    return lambda x: fn(x, *popt)


def fit_log(bpp, quality, sigma=None):
    """PSNR-style fit: a log(bpp) + b (optionally quadratic in log-bpp)."""
    def fn(x, a, b, c):
        lx = np.log(x)
        return a * lx + b + c * lx ** 2
    popt, _ = curve_fit(fn, bpp, quality, p0=(5.0, 30.0, 0.0), maxfev=20000,
                        sigma=sigma)
    return lambda x: fn(x, *popt)


_FITTERS = {'ssim': fit_logistic, 'msssim_db': fit_log, 'psnr': fit_log}


def _fit_sigma(metric, quality):
    if metric == 'ssim':
        return np.maximum(np.abs(1.0 - quality), 1e-3)
    return None


def fit_rd_curve(df, metric='ssim', points=50, grid=None):
    """Fit pooled R/D samples of one codec; returns (bpp_grid, fitted)."""
    df = df.dropna(subset=[metric, 'bpp'])
    bpp, quality = df['bpp'].values, df[metric].values
    if grid is None:
        lo, hi = np.percentile(bpp, 1), np.percentile(bpp, 99)
        grid = np.geomspace(max(lo, 1e-3), hi, points)
    fitted = _FITTERS[metric](bpp, quality, sigma=_fit_sigma(metric, quality))(grid)
    return grid, fitted


def fit_rd_curve_per_image(df, metric='ssim', points=50, grid=None):
    """Per-image fit-then-average (the reference's 'fit' mode,
    ratedistortion.py:414-562): fit each image's samples separately on a common
    bpp grid, then average the fitted curves. Statistically robust on
    heterogeneous image sets, unlike a single pooled fit."""
    df = df.dropna(subset=[metric, 'bpp'])
    if grid is None:
        bpp = df['bpp'].values
        lo, hi = np.percentile(bpp, 1), np.percentile(bpp, 99)
        grid = np.geomspace(max(lo, 1e-3), hi, points)
    curves = []
    for _, sel in df.groupby('image_id'):
        if len(sel) < 4:
            continue
        y = sel[metric].values
        try:
            fit = _FITTERS[metric](sel['bpp'].values, y, sigma=_fit_sigma(metric, y))
            curves.append(fit(grid))
        except (RuntimeError, ValueError):
            logger.warning('per-image R/D fit failed for image_id=%s',
                           sel['image_id'].iloc[0])
    if not curves:
        raise ValueError('No image had enough samples for a per-image fit')
    return grid, np.nanmean(np.stack(curves), axis=0)


def aggregate_rd(df, metric='ssim'):
    """Mean bpp/metric per quality level (the reference's 'aggregate' mode)."""
    group_key = 'n_features' if 'n_features' in df else 'quality'
    dfg = df.dropna(subset=[metric, 'bpp']).groupby(group_key)
    return dfg['bpp'].mean().values, dfg[metric].mean().values


def plot_curve(dfs, axes=None, metric='ssim', title=None, images=None,
               plot_type='fit', baseline_count=3, update_ylim=False,
               draw_markers=None):
    """Comparison R/D plot for a list of (or single) codec DataFrames.

    plot_type: 'fit' (per-image fit-then-average when multiple images are
    present), 'pooled' (single fit over all samples), 'aggregate' (mean per
    quality level), 'scatter'."""
    from matplotlib.figure import Figure
    if axes is None:
        axes = Figure(figsize=(8, 5)).gca()
    if isinstance(dfs, pd.DataFrame):
        dfs = [dfs]
    for df in dfs:
        if df.empty:
            continue
        for codec in df['codec'].unique():
            sel = df[df['codec'] == codec]
            if images is not None:
                sel = sel[sel['image_id'].isin(images)]
            if plot_type == 'aggregate':
                bpp, quality = aggregate_rd(sel, metric)
                axes.semilogx(bpp, quality, '-o', label=codec, alpha=0.7)
            elif plot_type in ('fit', 'pooled', 'line'):
                try:
                    if plot_type == 'fit' and sel['image_id'].nunique() > 1:
                        grid, fitted = fit_rd_curve_per_image(sel, metric)
                    else:
                        grid, fitted = fit_rd_curve(sel, metric)
                    axes.semilogx(grid, fitted, label=codec)
                except (RuntimeError, ValueError):
                    axes.semilogx(sel['bpp'], sel[metric], '.', label=codec)
            if plot_type in ('scatter', 'fit') and draw_markers is not False:
                axes.semilogx(sel['bpp'], sel[metric], '.', alpha=0.2)
    axes.set_xlabel('Effective bpp')
    axes.set_ylabel(metric)
    axes.legend()
    if title:
        axes.set_title(title)
    return axes


def plot_bulk(dfss, directory=None, metric='ssim', ncols=3):
    """Grid of per-image R/D comparisons across codecs."""
    from neural_imaging_tpu.utils import plots
    all_images = sorted(set().union(*[set(df['image_id'].unique())
                                      for df in dfss if not df.empty]))
    fig, axes = plots.sub(max(len(all_images), 1), figwidth=18, ncols=ncols)
    for ax, image_id in zip(axes, all_images):
        plot_curve(dfss, axes=ax, metric=metric, images=[image_id],
                   title=f'image {image_id}')
    return fig
