"""
Detection statistics (accuracy/TPR/ROC/AUC), codebook histograms/entropy and moving
averages. Capability parity with reference helpers/stats.py.
"""
import numpy as np
from scipy import stats as sstats


def span(negative, positive, bins=100):
    return np.linspace(min(positive.min(), negative.min()) - 1e-6,
                       max(positive.max(), negative.max()) + 1e-6, bins)


def detection_accuracy(positive, negative, bins=100, return_index=False):
    """Best threshold accuracy 0.5*(P(pos>=t) + P(neg<t)) over a threshold sweep."""
    if isinstance(bins, int):
        bins = span(negative, positive, bins)
    accuracies = [0.5 * (np.mean(positive >= t) + np.mean(negative < t)) for t in bins]
    if return_index:
        return max(accuracies), int(np.argmax(accuracies))
    return max(accuracies), bins[int(np.argmax(accuracies))]


def true_positive_rate(positive, negative, fpr=0.01):
    thresh = np.percentile(negative, 100 * (1 - fpr))
    return np.mean(positive >= thresh)


def roc(positive, negative, bins=100):
    cc = span(negative, positive, bins)
    tpr = [np.mean(positive >= t) for t in cc][::-1]
    fpr = [np.mean(negative >= t) for t in cc][::-1]
    return tpr, fpr


def auc(positive, negative, bins=100):
    tpr, fpr = roc(positive, negative, bins)
    if tpr[0] != 0 or fpr[0] != 0:
        raise ValueError('The ROC should start at (0, 0)')
    if tpr[-1] != 1 or fpr[-1] != 1:
        raise ValueError('The ROC should end at (1, 1)')
    return np.trapezoid(tpr, fpr)


def inlier_rate(candidates, reference, perc=0.05):
    lo = np.percentile(reference, 100 * perc)
    hi = np.percentile(reference, 100 * (1 - perc))
    return np.mean((candidates > lo) * (candidates < hi))


def corrcoeff(a, b):
    a = (a - np.mean(a)) / (1e-9 + np.std(a))
    b = (b - np.mean(b)) / (1e-9 + np.std(b))
    return np.mean(a * b)


def bin_edges(code_book):
    """Bin edges halfway between codebook centroids, padded with wide sentinels."""
    code_book = np.asarray(code_book, dtype=np.float64).reshape(-1)
    max_float = np.abs(code_book).max() * 2
    mid = np.convolve(code_book, [0.5, 0.5], mode='valid')
    return np.concatenate(([-max_float], mid, [max_float]))


def hist(values, code_book, density=False):
    """Histogram of values quantized to centroids (not numpy bin edges)."""
    f = np.histogram(np.asarray(values).ravel(), bins=bin_edges(code_book), density=density)[0]
    return f if not density else f / f.sum()


def entropy(samples, code_book=None):
    """Empirical entropy (bits) of samples quantized to a centroid codebook."""
    if code_book is None:
        code_book = np.arange(-255, 255, 1).reshape((-1,))
    counts = hist(samples, code_book)
    counts = counts.clip(min=1)
    probs = counts / counts.sum()
    return -np.sum(probs * np.log2(probs))


def kld_discrete(samples_a, samples_b, bins=25):
    cc = span(samples_a, samples_b, bins)
    p1 = hist(samples_a, cc, density=True).clip(min=1e-16)
    p2 = hist(samples_b, cc, density=True).clip(min=1e-16)
    return sstats.entropy(p1, p2)


def ma_gaussian(x, y, step_size=0.05, width=10):
    """Moving average with Gaussian weighting."""
    x, y = np.asarray(x), np.asarray(y)
    bin_centers = np.arange(np.min(x), np.max(x) - 0.5 * step_size, step_size) + 0.5 * step_size
    bin_avg = np.zeros(len(bin_centers))
    for i, center in enumerate(bin_centers):
        weights = np.exp(-(x - center) ** 2 / (2 * width ** 2))
        bin_avg[i] = np.average(y, weights=weights)
    return bin_centers, bin_avg


def ma_conv(x, n=10):
    """Moving average with a box filter (edge-padded)."""
    x = np.asarray(x)
    if len(x) == 0:
        return np.array([])
    if n == 0:
        n = len(x) // 10
    fn = 2 * n + 1
    return np.convolve(np.pad(x, n, 'edge'), np.ones((fn,)) / fn, mode='valid')


def ma_exp(x, alpha=0.1):
    """Exponential moving average."""
    x = np.asarray(x, dtype=np.float64)
    y = np.zeros_like(x)
    if len(x):
        y[0] = x[0]
        for i in range(1, x.shape[0]):
            y[i] = alpha * x[i] + (1 - alpha) * y[i - 1]
    return y
