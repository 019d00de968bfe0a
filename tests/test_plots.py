"""Tests for the plotting layer (headless, object-oriented matplotlib)."""
import numpy as np
import pytest

from neural_imaging_tpu.utils import plots


@pytest.fixture
def rgb():
    rng = np.random.default_rng(0)
    return rng.random((4, 16, 16, 3)).astype(np.float32)


class TestImagesGrid:
    def test_single_rgb(self, rgb):
        fig = plots.images(rgb[0])
        assert len(fig.axes) == 1

    def test_batch(self, rgb):
        fig = plots.images(rgb, titles=['a', 'b', 'c', 'd'])
        assert len(fig.axes) == 4
        assert fig.axes[0].get_title() == 'a'

    def test_channel_stack(self, rgb):
        fig = plots.images(rgb[0, :, :, :2].reshape(16, 16, 2))
        assert len(fig.axes) == 2

    def test_leading_one_channels(self):
        x = np.random.default_rng(1).random((1, 8, 8, 5))
        fig = plots.images(x)
        assert len(fig.axes) == 5

    def test_list_with_rowlabels(self, rgb):
        fig = plots.images([rgb[0], rgb[1]], ncols=2, rowlabels=['row0'])
        assert len(fig.axes) == 2

    def test_title_mismatch_raises(self, rgb):
        with pytest.raises(ValueError):
            plots.images(rgb, titles=['only-one'])

    def test_title_patterns(self, rgb):
        ax = plots.image(rgb[0], '{}')
        t = ax.get_title()
        assert '(16x16)' in t and '[' in t
        ax = plots.image(rgb[0], '<>')
        assert '±' in ax.get_title()


class TestSub:
    def test_square(self):
        fig, axes = plots.sub(5)
        assert len(axes) == 5
        assert len(fig.axes) == 5  # surplus axes removed

    def test_negative_ncols_means_rows(self):
        _, axes = plots.sub(6, ncols=-2)  # 2 rows -> 3 columns
        assert len(axes) == 6

    def test_transpose(self):
        _, axes = plots.sub(4, ncols=2, transpose=True)
        assert len(axes) == 4


class TestThumbnails:
    def test_rowwise_vs_columnwise(self, rgb):
        a = plots.thumbnails(rgb, ncols=2)
        b = plots.thumbnails(rgb, ncols=2, columnwise=True)
        assert a.shape == b.shape == (32, 32, 3)
        # element [1] lands right of [0] rowwise, below it columnwise
        assert np.allclose(a[:16, 16:], rgb[1])
        assert np.allclose(b[16:, :16], rgb[1])

    def test_list_input(self, rgb):
        out = plots.thumbnails(list(rgb))
        assert out.shape == (32, 32, 3)


class TestProgress:
    def test_perf_and_progress(self):
        hist = {'loss': {'training': list(np.linspace(10, 1, 50)),
                         'validation': list(np.linspace(9, 2, 5))},
                'psnr': {'training': [], 'validation': [30.0, 35.0, 39.0]}}
        fig = plots.perf(hist)
        assert len(fig.axes) == 2
        ax = plots.progress('loss', hist['loss'])
        assert ax.get_title() == 'loss'
        assert len(ax.get_legend().get_texts()) == 2

    def test_log_scaling_on_plateau(self):
        values = [1.0] * 5 + [0.5] + [0.1000001] * 44
        ax = plots.progress('m', {'training': values}, log='auto')
        assert ax.get_yscale() == 'log'


class TestDetection:
    def test_histograms_and_accuracy(self):
        rng = np.random.default_rng(2)
        pos = rng.normal(2.0, 0.5, 500)
        neg = rng.normal(0.0, 0.5, 500)
        ax = plots.detection(pos, neg, bins=50, reference=1.0)
        assert 'acc = ' in ax.get_title()
        assert len(ax.get_legend().get_texts()) == 2
