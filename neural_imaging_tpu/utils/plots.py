"""
Plotting helpers: thumbnails, flexible image grids, subplot scaffolding,
training-progress curves, confusion matrices, detection/ROC and correlation plots.

Capability parity with reference helpers/plots.py (§2.14), including the richer
variants: ``images()`` accepts the same input structures (arrays, lists, channel
stacks), ``image()`` supports the title placeholders ('()' shape, '[]' range,
'{}' both, '<>' mean±std), ``sub()`` removes unused axes and supports transposed
traversal, and ``detection()`` renders score-distribution histograms. Uses
matplotlib's object-oriented API (no global state, safe in headless loops).
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


def image(img, title=None, axes=None, cmap='gray'):
    """Show one image; hides ticks. Title placeholders (ref helpers/plots.py:226):
    '()' → (h x w), '[]' → [min - max], '{}' → both, '<>' → mean ± std."""
    arr = np.asarray(img).squeeze()
    if title and any(p in title for p in ('{}', '()', '[]', '<>')):
        title = title.replace('{}', '() / []')
        title = title.replace('()', '({}x{})'.format(*arr.shape[:2]))
        title = title.replace('[]', '[{:.2f} - {:.2f}]'.format(arr.min(), arr.max()))
        title = title.replace('<>', '{:.2f} ± {:.2f}'.format(arr.mean(), arr.std()))
    if axes is None:
        fig = Figure()
        axes = fig.gca()
    axes.imshow(_to_display(arr), cmap=cmap)
    axes.set_xticks([])
    axes.set_yticks([])
    if title:
        axes.set_title(title, fontsize=8)
    return axes


def thumbnails(batch, ncols=None, columnwise=False):
    """Tile a batch (n, h, w, c) — or a list of same-size images — into one array."""
    batch = np.stack([np.asarray(b) for b in batch]) \
        if isinstance(batch, (list, tuple)) else np.asarray(batch)
    if batch.ndim == 3:
        batch = batch[..., None]
    n, h, w, c = batch.shape
    ncols = ncols or int(math.ceil(math.sqrt(n)))
    nrows = int(math.ceil(n / ncols))
    canvas = np.zeros((nrows * h, ncols * w, c), dtype=np.float32)
    for i in range(n):
        if columnwise:
            col, r = divmod(i, nrows)
        else:
            r, col = divmod(i, ncols)
        canvas[r * h:(r + 1) * h, col * w:(col + 1) * w] = np.clip(batch[i], 0, 1)
    return canvas


def sub(n_plots, figwidth=16, ncols=None, figheight=None, fig=None, transpose=False):
    """Figure split into n subplots; returns (fig, list_of_axes). ncols semantics
    follow the reference (helpers/plots.py:258): None/0 → square-ish, negative →
    that many ROWS; surplus axes are removed."""
    if not ncols:
        ncols = int(math.ceil(math.sqrt(n_plots)))
    elif ncols < 0:
        ncols = max(n_plots // abs(ncols), 1)
    nrows = int(math.ceil(n_plots / ncols))
    if transpose:
        ncols, nrows = nrows, ncols
    fig = fig or Figure(figsize=(figwidth, (figheight or figwidth) * nrows / ncols))
    axes = [fig.add_subplot(nrows, ncols, i + 1) for i in range(nrows * ncols)]
    for ax in axes[n_plots:]:
        ax.remove()
    axes = axes[:n_plots]
    if transpose:
        from itertools import product
        order = [j * ncols + i for i, j in product(range(ncols), range(nrows))]
        axes = [axes[k] for k in order if k < n_plots]
    return fig, axes


def images(imgs, titles=None, figwidth=4, cmap='gray', ncols=None, fig=None,
           rowlabels=None):
    """
    Grid plot for various image structures (ref helpers/plots.py:150-223):

    - (h, w) or (h, w, 3) array → single image
    - (h, w, C≠3) array → channels as separate panels
    - (N, h, w, 3|1) array → batch panels
    - (1, h, w, C) array → channels as separate panels
    - list/tuple of arrays → one panel each
    """
    if isinstance(imgs, (list, tuple)):
        panels = [np.asarray(x) for x in imgs]
    else:
        imgs = np.asarray(imgs)
        if imgs.ndim == 2 or (imgs.ndim == 3 and imgs.shape[-1] == 3):
            panels = [imgs]
        elif imgs.ndim == 3:
            panels = [imgs[..., i] for i in range(imgs.shape[-1])]
        elif imgs.ndim == 4 and imgs.shape[-1] in (1, 3):
            panels = list(imgs)
        elif imgs.ndim == 4 and imgs.shape[0] == 1:
            panels = [imgs[0, ..., i] for i in range(imgs.shape[-1])]
        else:
            raise ValueError(f'Unsupported array dimensions {imgs.shape}!')

    n = len(panels)
    if n > 128:
        raise RuntimeError(f'The number of subplots exceeds reasonable limits ({n})!')
    if isinstance(titles, str):
        titles = [titles] * n
    if titles is not None and len(titles) != n:
        raise ValueError(f'Provided titles ({len(titles)}) do not match images ({n})!')

    ncols_eff = ncols or int(math.ceil(math.sqrt(n)))
    nrows = int(math.ceil(n / ncols_eff))
    if rowlabels is not None and len(rowlabels) != nrows:
        raise ValueError('The number of rows does not match the provided labels!')

    fig, axes = sub(n, figwidth=figwidth * ncols_eff, ncols=ncols_eff, fig=fig)
    for i, (ax, panel) in enumerate(zip(axes, panels)):
        image(panel, titles[i] if titles else None, axes=ax, cmap=cmap)
        if rowlabels is not None and i % ncols_eff == 0:
            ax.set_ylabel(rowlabels[i // ncols_eff])
    return fig


def progress(name, history, results=('training', 'validation'), log='auto',
             axes=None, start=0, alpha=0.8):
    """One metric's progress curve: raw points + exponential moving average, with
    automatic log scaling for plateaued metrics (ref helpers/plots.py:316)."""
    from neural_imaging_tpu.utils import stats
    if axes is None:
        axes = Figure().gca()
    markers = '.os^'
    active = False
    for ri, r in enumerate(results):
        values = history.get(r, []) if isinstance(history, dict) else history
        if len(values) == 0:
            continue
        active = True
        xr = start + np.linspace(0, 100, len(values))
        axes.plot(xr, values, f'C{ri}{markers[ri % len(markers)]}', alpha=0.5)
        axes.plot(xr, stats.ma_exp(values, alpha), f'C{ri}-',
                  label=f'{r} ({values[-1]:.3f})')
        n_hist = len(values) // 2
        spread = max(values) - min(values)
        if log is True or (log == 'auto' and n_hist > 1 and spread > 0
                           and np.std(values[-n_hist:]) / spread < 0.02):
            axes.set_yscale('log')
    axes.set_title(name)
    axes.set_xlabel('Training progress [%]')
    if active:
        axes.legend()
    return axes


def perf(performance, scopes=('training', 'validation'), figwidth=16, log='auto'):
    """Plot metric histories from a performance dict {metric: {scope: [...]}}."""
    metric_names = [m for m, v in performance.items()
                    if isinstance(v, dict) and any(len(v.get(s, [])) for s in scopes)]
    fig, axes = sub(max(len(metric_names), 1), figwidth)
    for ax, metric in zip(axes, metric_names):
        progress(metric, performance[metric], scopes, log=log, axes=ax)
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


def detection(positive, negative, bins=200, axes=None, title='detection scores',
              reference=None):
    """Score-distribution histograms for a binary detector (ref plots.py:379):
    overlaid positive/negative histograms with the accuracy in the title."""
    from neural_imaging_tpu.utils import stats
    positive = np.asarray(positive).ravel()
    negative = np.asarray(negative).ravel()
    if axes is None:
        axes = Figure().gca()
    lo = min(positive.min(), negative.min())
    hi = max(positive.max(), negative.max())
    edges = np.linspace(lo, hi, bins + 1)
    axes.hist(negative, bins=edges, alpha=0.5, density=True, label='negative')
    axes.hist(positive, bins=edges, alpha=0.5, density=True, label='positive')
    if reference is not None:
        axes.axvline(reference, color='k', linestyle=':')
    try:
        acc, _ = stats.detection_accuracy(positive, negative, bins)
        axes.set_title(f'{title} (acc = {acc:.3f})')
    except (ValueError, AttributeError):
        axes.set_title(title)
    axes.legend()
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
