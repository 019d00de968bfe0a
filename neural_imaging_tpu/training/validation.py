"""
Validation routines for the workflow components: JPEG/DCN codecs, NIP developers
and the FAN classifier, plus the nested ``training.json`` writer.

Capability parity with reference training/validation.py; validation inference is
batched through the jitted apply functions rather than per-image eager calls.
"""
import os
from collections import OrderedDict

import numpy as np

from neural_imaging_tpu.utils import jsonlog, metrics, plots, stats
from neural_imaging_tpu.utils.utils import logger


def validate_jpeg(jpeg_codec, data, batch_size=1):
    """Mean PSNR/SSIM/entropy of the JPEG codec over the validation set."""
    from neural_imaging_tpu.models.jpeg import JPEG
    if not isinstance(jpeg_codec, JPEG):
        raise ValueError(f'Codec needs to be an instance of JPEG but is {type(jpeg_codec)}')

    batch_size = min(batch_size, data.count_validation)
    n_batches = data.count_validation // batch_size
    results = {k: [] for k in ('psnr', 'ssim', 'entropy')}

    for batch_id in range(n_batches):
        batch_x = data.next_validation_batch(batch_id, batch_size)
        if isinstance(batch_x, tuple):
            batch_x = batch_x[-1]
        batch_y, entropy = jpeg_codec.process(batch_x, return_entropy=True)
        batch_y = np.asarray(batch_y)
        results['ssim'].append(metrics.batch(batch_x, batch_y, metrics.ssim))
        results['psnr'].append(metrics.batch(batch_x, batch_y, metrics.psnr))
        results['entropy'].append(entropy)

    return {k: float(np.mean(v)) for k, v in results.items()}


def validate_dcn(dcn, data, save_dir=None, epoch=0, show_ref=False):
    """Mean SSIM/PSNR/loss/entropy of a DCN over the validation set (+ thumbnails)."""
    from neural_imaging_tpu.models.compression import DCN
    if not isinstance(dcn, DCN):
        return None

    batch_x = data.next_validation_batch(0, data.count_validation)
    if isinstance(batch_x, tuple):
        batch_x = batch_x[-1]
    batch_y, entropy = dcn.process(batch_x, return_entropy=True)
    batch_y = np.asarray(batch_y)
    entropy = float(entropy)

    ssim = metrics.ssim(batch_x, batch_y)
    psnr = metrics.psnr(batch_x, batch_y)
    loss = float(dcn.loss(batch_x, batch_y, entropy))

    if save_dir is not None:
        n = data.count_validation
        fig, axes = plots.sub(n, figwidth=20)
        for b in range(n):
            plots.image(np.concatenate((batch_x[b], batch_y[b]), axis=1) if show_ref
                        else batch_y[b],
                        f'{psnr[b]:.1f} / {ssim[b]:.2f}', axes=axes[b])
        plots.save_figure(fig, os.path.join(save_dir, f'dcn_validation_{epoch:05d}.jpg'))

    return {'ssim': float(np.mean(ssim)), 'psnr': float(np.mean(psnr)),
            'loss': loss, 'entropy': entropy}


def validate_nip(model, data, save_dir=None, epoch=0, show_ref=False, loss_type='L2'):
    """Develop validation patches; returns per-image (ssims, psnrs, losses)."""
    example_x, example_y = data.next_validation_batch(0, data.count_validation)
    developed = np.asarray(model.process(example_x)).clip(0, 1)

    ssims, psnrs, losses = [], [], []
    for b in range(data.count_validation):
        reference, dev = example_y[b], developed[b]
        ssims.append(float(metrics.ssim(reference, dev)))
        psnrs.append(float(metrics.psnr(reference, dev)))
        if loss_type == 'L2':
            losses.append(float(np.mean((reference - dev) ** 2)))
        elif loss_type == 'L1':
            losses.append(float(np.mean(np.abs(reference - dev))))
        else:
            raise ValueError('Invalid loss! Use either L1 or L2.')

    if save_dir is not None:
        fig, axes = plots.sub(data.count_validation, figwidth=20)
        for b in range(data.count_validation):
            plots.image(np.concatenate((example_y[b], developed[b]), axis=1) if show_ref
                        else developed[b],
                        f'{psnrs[b]:.1f} dB / {ssims[b]:.2f}', axes=axes[b])
        plots.save_figure(fig, os.path.join(save_dir, f'nip_validation_{epoch:05d}.jpg'))

    return ssims, psnrs, losses


def validate_fan(flow, data, get_labels=False, randomize=False, repeats=1):
    """Accuracy + n×n confusion matrix of the workflow's FAN on validation data.

    ``randomize=True`` evaluates each batch with freshly randomized
    manipulation strengths (the distribution the augmented trainer optimizes,
    ``--augment``) instead of the fixed canonical strengths; ``repeats`` passes
    over the validation set aggregate the accuracy/confusion across independent
    strength draws."""
    batch_size = min(10, data.count_validation)
    n_batches = data.count_validation // batch_size
    n_classes = flow.n_classes
    conf = np.zeros((n_classes, n_classes))
    out_labels = []
    accuracies = []

    for batch in range(n_batches * max(1, repeats)):
        batch_x = data.next_validation_batch(batch % n_batches, batch_size)
        if isinstance(batch_x, tuple):
            batch_x = batch_x[0]
        batch_labels = flow._batch_labels(len(batch_x))
        predicted = flow.run_workflow_to_decisions(batch_x, augment=randomize)
        if get_labels:
            out_labels += list(predicted)
        for c in range(n_classes):
            for c_ in range(n_classes):
                conf[c, c_] += np.sum((batch_labels == c) * (predicted == c_))
        accuracies.append(np.mean(predicted == batch_labels))

    conf = conf / conf.sum(axis=1, keepdims=True).clip(min=1)
    if out_labels:
        return float(np.mean(accuracies)), conf, out_labels
    return float(np.mean(accuracies)), conf


def visualize_manipulation_training(flow, epoch, save_dir=None):
    """9-panel (or 6-panel) training-progress figure: NIP loss/psnr/ssim, FAN
    loss/accuracy/confusion, and DCN loss/ssim/entropy when trainable."""
    from neural_imaging_tpu.models.compression import DCN
    with_dcn = isinstance(flow.codec, DCN)
    fig, axes = plots.sub(9 if with_dcn else 6, figwidth=18, ncols=3)

    def curve(ax, values, label):
        values = list(values)
        if values:
            ax.plot(values, '.', alpha=0.25)
            ax.plot(stats.ma_conv(values, 0))
        ax.set_ylabel(label)

    curve(axes[0], flow.nip.performance['loss']['training'], f'{flow.nip.class_name} NIP loss')
    curve(axes[1], flow.nip.performance['psnr']['validation'], 'NIP psnr')
    curve(axes[2], flow.nip.performance['ssim']['validation'], 'NIP ssim')
    curve(axes[3], flow.fan.performance['loss']['training'], 'FAN loss')
    curve(axes[4], flow.fan.performance['accuracy']['validation'], 'FAN accuracy')
    axes[4].set_ylim([0, 1])

    conf = np.array(flow.fan.performance.get('confusion') or np.eye(flow.n_classes))
    plots.confusion(conf, flow._forensics_classes, axes=axes[5])

    if with_dcn:
        curve(axes[6], flow.codec.performance['loss']['validation'], 'DCN loss')
        curve(axes[7], flow.codec.performance['ssim']['validation'], 'DCN ssim')
        curve(axes[8], flow.codec.performance['entropy']['validation'], 'DCN entropy')

    if save_dir is not None:
        plots.save_figure(fig, os.path.join(save_dir, f'manip_validation_{epoch:05d}.jpg'))
        return None
    return fig


def save_training_progress(training_summary, flow, root_dir, quiet=False):
    """Write the nested ``training.json`` consumed by the results layer and the E2E
    framework test: {summary, distribution, manipulations, nip, forensics, codec}."""
    training = OrderedDict()
    training['summary'] = training_summary
    training['distribution'] = flow._distribution
    # channel precision knobs: without them a re-validation (test_fan.py)
    # silently rebuilds an f32 channel for a bf16-trained workflow — a
    # train/deploy mismatch measured at -0.11 accuracy (docs/quality_runs.md
    # round-5 cross-validation)
    import jax.numpy as jnp
    training['channel_precision'] = {
        'channel_dtype': ('bfloat16' if flow._channel_dtype == jnp.bfloat16
                          else 'float32'),
        'channel_jpeg_dtype': ('bfloat16' if flow._channel_jpeg_bf16
                               else 'float32'),
        'manip_jpeg_dtype': ('bfloat16' if flow._manip_jpeg_bf16
                             else 'float32'),
    }
    training['manipulations'] = flow._forensics_classes

    training['nip'] = OrderedDict(
        model=flow.nip.class_name, init=repr(flow.nip),
        args=flow.nip._h.to_json() if hasattr(flow.nip, '_h') else {},
        performance=flow.nip.performance)

    training['forensics'] = OrderedDict(
        model=flow.fan.class_name, init=repr(flow.fan),
        args=flow.fan._h.to_json(), performance=flow.fan.performance)

    if flow.codec is not None:
        training['codec'] = OrderedDict(model=flow.codec.class_name, init=repr(flow.codec))
        if hasattr(flow.codec, '_h'):
            training['codec']['args'] = flow.codec._h.to_json()
        if hasattr(flow.codec, 'performance'):
            training['codec']['performance'] = flow.codec.performance

    filename = os.path.join(root_dir, 'training.json')
    if not quiet:
        logger.info('> Training progress --> %s', filename)
    jsonlog.save_json(training, filename)
