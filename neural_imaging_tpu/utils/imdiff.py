"""
A/B image comparison figures with difference maps and FFT spectra.

Capability parity with reference helpers/imdiff.py (used by diff_nip.py).
"""
import numpy as np

from neural_imaging_tpu.utils import image as image_helpers
from neural_imaging_tpu.utils import metrics, plots


def compare_ab_ref(img_ref, img_a, img_b=None, fig=None, extras=False):
    """
    Render a comparison figure: reference, A (and optionally B), their differences
    against the reference, and optionally log-FFT spectra of the differences.
    Returns a matplotlib Figure.
    """
    img_ref = np.asarray(img_ref).squeeze()
    img_a = np.asarray(img_a).squeeze()
    items = [('reference', img_ref, None)]
    items.append(('A: {:.1f} dB / {:.3f}'.format(metrics.psnr(img_ref, img_a),
                                                 metrics.ssim(img_ref, img_a)), img_a, None))
    if img_b is not None:
        img_b = np.asarray(img_b).squeeze()
        items.append(('B: {:.1f} dB / {:.3f}'.format(metrics.psnr(img_ref, img_b),
                                                     metrics.ssim(img_ref, img_b)), img_b, None))

    diffs = [('diff A', image_helpers.normalize(np.abs(img_a - img_ref).mean(-1)))]
    if img_b is not None:
        diffs.append(('diff B', image_helpers.normalize(np.abs(img_b - img_ref).mean(-1))))
        diffs.append(('diff A-B', image_helpers.normalize(np.abs(img_a - img_b).mean(-1))))

    extras_items = []
    if extras:
        extras_items.append(('fft diff A', image_helpers.fft_log_norm(
            np.repeat((img_a - img_ref).mean(-1)[..., None], 3, axis=-1))))
        if img_b is not None:
            extras_items.append(('fft diff B', image_helpers.fft_log_norm(
                np.repeat((img_b - img_ref).mean(-1)[..., None], 3, axis=-1))))

    n = len(items) + len(diffs) + len(extras_items)
    fig, axes = plots.sub(n, figwidth=16)
    i = 0
    for title, img, _ in items:
        plots.image(img, title, axes=axes[i]); i += 1
    for title, img in diffs:
        axes[i].imshow(img, cmap='gray')
        axes[i].set_title(title, fontsize=8)
        axes[i].set_xticks([]); axes[i].set_yticks([])
        i += 1
    for title, img in extras_items:
        plots.image(img, title, axes=axes[i]); i += 1
    return fig
