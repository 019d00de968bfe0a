"""
Plotting helpers: thumbnails, image grids, subplot scaffolding, training-progress
curves, confusion matrices, detection/ROC and correlation plots.

Capability parity with reference helpers/plots.py (§2.14). Uses matplotlib's
object-oriented API (no global state, safe in headless training loops).
"""
import math

import numpy as np
from matplotlib.figure import Figure


def _to_display(img):
    img = np.asarray(img)
    img = img.squeeze()
    if img.dtype in (np.uint8, np.uint16):
        img = img.astype(np.float64) / np.iinfo(img.dtype).max
    return np.clip(img, 0, 1)


def image(img, title=None, axes=None):
    """Show a single image on given (or fresh) axes; returns the axes."""
    if axes is None:
        fig = Figure()
        axes = fig.gca()
    axes.imshow(_to_display(img))
    axes.set_xticks([])
    axes.set_yticks([])
    if title:
        axes.set_title(title, fontsize=8)
    return axes


def thumbnails(batch, ncols=None):
    """Tile a batch (n, h, w, c) into one image array of thumbnails."""
    batch = np.asarray(batch)
    n, h, w, c = batch.shape
    ncols = ncols or int(math.ceil(math.sqrt(n)))
    nrows = int(math.ceil(n / ncols))
    canvas = np.zeros((nrows * h, ncols * w, c), dtype=np.float32)
    for i in range(n):
        r, col = divmod(i, ncols)
        canvas[r * h:(r + 1) * h, col * w:(col + 1) * w] = np.clip(batch[i], 0, 1)
    return canvas


def sub(n_plots, figwidth=16, ncols=None):
    """Create a figure with n subplots; returns (fig, list_of_axes)."""
    ncols = ncols or int(math.ceil(math.sqrt(n_plots)))
    nrows = int(math.ceil(n_plots / ncols))
    fig = Figure(figsize=(figwidth, figwidth * nrows / ncols))
    axes = [fig.add_subplot(nrows, ncols, i + 1) for i in range(n_plots)]
    return fig, axes


def perf(performance, scopes=('training', 'validation'), figwidth=16):
    """Plot metric histories from a performance dict {metric: {scope: [...]}}."""
    from neural_imaging_tpu.utils import stats
    metric_names = [m for m, v in performance.items()
                    if isinstance(v, dict) and any(len(v.get(s, [])) for s in scopes)]
    fig, axes = sub(max(len(metric_names), 1), figwidth)
    for ax, metric in zip(axes, metric_names):
        for scope in scopes:
            values = performance[metric].get(scope, [])
            if len(values):
                ax.plot(values, '.', alpha=0.25)
                ax.plot(stats.ma_conv(values, 0), label=scope)
        ax.set_title(metric)
        ax.legend()
    return fig


def confusion(conf, class_names=None, axes=None):
    """Render a confusion matrix with per-class accuracy annotations."""
    conf = np.asarray(conf)
    if axes is None:
        fig = Figure(figsize=(5, 5))
        axes = fig.gca()
    axes.imshow(conf, vmin=0, vmax=1)
    n = conf.shape[0]
    if class_names is not None:
        axes.set_xticks(range(n))
        axes.set_xticklabels(class_names, rotation='vertical', fontsize=7)
        axes.set_yticks(range(n))
        axes.set_yticklabels(class_names, fontsize=7)
    for r in range(n):
        axes.text(r, r, f'{conf[r, r]:.2f}', horizontalalignment='center',
                  color='b' if conf[r, r] > 0.5 else 'w', fontsize=7)
    axes.set_xlabel('PREDICTED class')
    axes.set_ylabel('TRUE class')
    axes.set_title(f'Accuracy: {np.mean(np.diag(conf)):.2f}')
    return axes


def roc(positive, negative, bins=100, axes=None):
    """Plot an ROC curve from positive/negative detection scores."""
    from neural_imaging_tpu.utils import stats
    tpr, fpr = stats.roc(np.asarray(positive), np.asarray(negative), bins)
    if axes is None:
        fig = Figure()
        axes = fig.gca()
    axes.plot(fpr, tpr)
    axes.plot([0, 1], [0, 1], 'k:')
    axes.set_xlabel('FPR')
    axes.set_ylabel('TPR')
    try:
        axes.set_title(f'AUC = {stats.auc(np.asarray(positive), np.asarray(negative), bins):.3f}')
    except ValueError:
        pass
    return axes


def correlation(a, b, axes=None, hexbin=False):
    """Scatter/hex correlation plot with the correlation coefficient in the title."""
    from neural_imaging_tpu.utils import stats
    a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
    if axes is None:
        fig = Figure()
        axes = fig.gca()
    if hexbin:
        axes.hexbin(a, b, gridsize=40, mincnt=1)
    else:
        axes.plot(a, b, '.', alpha=0.25)
    axes.set_title(f'corr = {stats.corrcoeff(a, b):.3f}')
    return axes


def save_figure(fig, filename, dpi=100):
    import os
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    fig.savefig(filename, bbox_inches='tight', dpi=dpi)
