"""
Joint-workflow training loop (the flagship trainer).

Capability parity with reference training/manipulation.py: reference-scheme output
directories (root/camera/NIP/{ln-*|fixed-nip}/{lc-*|fixed-codec}/run), per-camera
pre-trained NIP loading, the epoch loop over the single jitted workflow step,
periodic FAN/NIP/codec validation, ``training.json`` logging and model snapshots.
"""
import os
import shutil
from collections import OrderedDict, deque

import numpy as np
from tqdm import tqdm

from neural_imaging_tpu.training import validation
from neural_imaging_tpu.utils import utils
from neural_imaging_tpu.utils.utils import logger


def default_training_specs():
    return {
        'use_pretrained_nip': True,
        'patch_size': 64,
        'batch_size': 10,
        'validation_schedule': 50,
        'n_epochs': 1001,
        'learning_rate': 1e-4,
        'run_number': 0,
        'lambda_nip': 0.1,
        'lambda_dcn': 0,
        'augment': False,
    }


def train_manipulation_nip(flow, training, data, directories=None, overwrite=False,
                           parallel=None, nan_check=False, device_data=False):
    """
    Train the manipulation-classification workflow. Minimal inner loop:

        for batch_id in range(n_batches):
            batch_x, batch_y = data.next_training_batch(batch_id, batch, 2*patch)
            loss, losses = flow.training_step(batch_x, batch_y, l_nip, l_dcn, ...)

    Returns the model snapshot directory.

    ``parallel``: optional parallel.train.DataParallel — replicates the joint
    parameter partitions over the mesh and lands each batch pre-sharded, so the
    single jitted workflow step runs SPMD (the reference loop is single-device,
    ref training/manipulation.py:36).

    ``nan_check=False`` (default) defers the NaN-gradient guard to every
    validation boundary via ``flow.assert_finite()`` — the per-step host sync
    the guard otherwise forces is the single biggest throughput killer
    (docs/benchmarks.md). Pass True to fail on the exact offending step
    (reference semantics, ref workflows/manipulation_classification.py:281).

    ``device_data=True`` uploads the full training set to HBM once and samples
    patches in-graph (data.device_sampler.DeviceSampler) — zero host→device
    traffic in the hot loop; the fastest path. Composes with ``parallel``
    (replicated images, shard-constrained batches → SPMD scanned steps).
    """
    dirs = {'root': './data/m/', 'nip_snapshots': './data/models/nip/'}
    if directories is not None:
        dirs.update(directories)
    directories = dirs

    spec = default_training_specs()
    if training is not None:
        spec.update(training)
    training = spec

    required = {'camera_name', 'use_pretrained_nip', 'lambda_nip', 'lambda_dcn',
                'run_number', 'n_epochs', 'learning_rate', 'augment'}
    missing = required.difference(training.keys())
    if missing:
        raise RuntimeError(f'Missing keys in the training dictionary! {missing}')
    if data is None:
        raise ValueError('Training data seems not to be loaded!')

    # dataset sanity check
    try:
        if data.is_raw_and_rgb():
            bx, by = data.next_training_batch(0, 1, training['patch_size'] * 2)
            expected = (1, training['patch_size'], training['patch_size'], 4)
            if bx.shape != expected:
                raise ValueError(f'The RAW+RGB training batch is of invalid size! {bx.shape}')
        else:
            bx = data.next_training_batch(0, 1, training['patch_size'] * 2)
            if bx.shape != (1, 2 * training['patch_size'], 2 * training['patch_size'], 3):
                raise ValueError(f'The RGB training batch is of invalid size! {bx.shape}')
    except Exception as e:
        raise ValueError(f'Data set error: {e}')

    logger.info('Training manipulation classification: cam=%s / ln=%.4f / run=%3d / '
                'epochs=%d, root=%s', training['camera_name'], training['lambda_nip'],
                training['run_number'], training['n_epochs'], directories['root'])

    # output directory scheme (ref training/manipulation.py:107-123)
    save_dir = [directories['root'], training['camera_name'], flow.nip.class_name]
    save_dir.append('ln-{:0.4f}'.format(training['lambda_nip'])
                    if flow.is_trainable('nip') else 'fixed-nip')
    save_dir.append('lc-{:0.4f}'.format(training['lambda_dcn'])
                    if flow.is_trainable('dcn') else 'fixed-codec')
    save_dir.append('{:03d}'.format(training['run_number']))
    save_dir = os.path.join(*save_dir)
    model_directory = os.path.join(save_dir, 'models')
    logger.info('(progress) -> %s', save_dir)
    logger.info('(model) ----> %s', model_directory)

    if os.path.exists(save_dir) and not overwrite:
        logger.debug('Directory exists, skipping...')
        return model_directory

    if flow.is_trainable('nip') and flow.nip.count_parameters() == 0:
        raise ValueError('Trying to optimize a NIP with no trainable parameters!')

    lr_decay_schedule = 100
    lr_decay_rate = 0.90
    learning_rate = training['learning_rate']
    n_batches = data.count_training // training['batch_size']
    if n_batches == 0:
        raise ValueError(
            f'Batch size ({training["batch_size"]}) exceeds dataset size '
            f'({data.count_training}) — zero training batches per epoch!')

    if training['use_pretrained_nip'] and flow.nip.count_parameters() > 0:
        nip_dirname = os.path.join(directories['nip_snapshots'],
                                   training['camera_name'], flow.nip.model_code)
        logger.debug('Loading camera model from %s', nip_dirname)
        flow.nip.load_model(nip_dirname)
        flow.params['nip'] = flow.nip.params

    flow.nan_check = nan_check
    if parallel is not None:
        # after the pre-trained NIP load so restored weights get replicated too
        parallel.check_batch(training['batch_size'])
        parallel.distribute(flow)
        logger.info('Training %s', parallel.describe())

    model_list = ['nip', 'fan']
    loss_last_k = {key: deque(maxlen=10) for key in model_list}
    # Per-epoch losses stay ON DEVICE between validation points: materializing a
    # scalar (float()) blocks the host on the step result, which serializes the
    # pipeline — over a tunneled chip that is a full RTT per step and was
    # measured at ~1.6 steps/s vs the same graph's 25+ steps/s when steps are
    # left to enqueue freely (docs/benchmarks.md "async epoch loop").
    pending = {key: [] for key in model_list}  # device means, one per epoch

    def flush_pending():
        """One host transfer for all epochs since the last flush."""
        if not pending['fan']:
            return
        import jax
        import jax.numpy as jnp
        models = {'nip': flow.nip, 'fan': flow.fan}
        values = {k: np.asarray(jax.device_get(jnp.stack(v)), dtype=np.float64)
                  for k, v in pending.items() if v}
        for key, vals in values.items():
            for v in vals:
                models[key].log_metric('loss', 'training', float(v))
                loss_last_k[key].append(float(v))
            pending[key].clear()

    training_summary = OrderedDict()
    training_summary['Problem'] = flow.summary()
    training_summary['Dataset'] = data.summary()
    training_summary['Camera name'] = training['camera_name']
    training_summary['Classes'] = f'{flow._forensics_classes}'
    training_summary['FAN model'] = flow.fan.summary()
    training_summary['NIP model'] = flow.nip.summary()
    training_summary['Channel Downsampling'] = flow._distribution['downsampling']
    training_summary['Channel Compression'] = (flow.codec.summary()
                                               if flow.codec is not None else 'n/a')
    training_summary['Joint optimization'] = f'{flow.trainable_models}'
    training_summary['NIP Regularization'] = utils.format_number(training['lambda_nip'])
    training_summary['DCN Regularization'] = utils.format_number(training['lambda_dcn'])
    training_summary['NIP loss'] = f'{flow.nip.loss_metric}'
    training_summary['Use pre-trained NIP'] = str(training['use_pretrained_nip'])
    training_summary['# Epochs'] = utils.format_number(training['n_epochs'])
    training_summary['Patch size'] = utils.format_number(training['patch_size'])
    training_summary['Batch size'] = utils.format_number(training['batch_size'])
    training_summary['Learning rate'] = utils.format_number(training['learning_rate'])
    training_summary['Validation schedule'] = training['validation_schedule']
    training_summary['Augmentation'] = str(training['augment'])

    print('')
    for k, v in training_summary.items():
        print(f'{k:30s}: {v}')
    print('', flush=True)

    epoch = 0
    with tqdm(total=training['n_epochs'], ncols=120, desc='Train') as pbar:
        from neural_imaging_tpu.data.prefetch import EpochPrefetcher
        prefetcher = EpochPrefetcher(data, training['batch_size'],
                                     2 * training['patch_size'], discard='flat',
                                     sharding=(parallel.batch_sharding
                                               if parallel is not None else None),
                                     quantized=True)
        sampler = None
        scan_cache = {}
        if device_data:
            from neural_imaging_tpu.data.device_sampler import DeviceSampler
            sampler = DeviceSampler(data, training['batch_size'],
                                    2 * training['patch_size'], discard='flat',
                                    sharding=(parallel.batch_sharding
                                              if parallel is not None else None))
            logger.info('Training from device-resident data (%d images in HBM, '
                        'scanned multi-epoch steps%s)', sampler.n_images,
                        ', ' + parallel.describe() if parallel is not None else '')

        def scanned_epoch(epoch, lr):
            """Train up to the next validation/lr boundary in ONE jitted
            lax.scan (in-graph sampling — zero host work per step); returns
            this epoch's device-mean losses from the chunk cache."""
            if epoch not in scan_cache:
                last = epoch
                while not (last % training['validation_schedule'] == 0
                           or last % lr_decay_schedule == 0
                           or last == training['n_epochs'] - 1):
                    last += 1
                # fixed ladder of scan lengths so only ~3 distinct programs
                # ever compile, whatever the validation/lr schedules are
                remaining = last - epoch + 1
                n_ep = next(k for k in (25, 5, 1) if k <= remaining)
                spe = sampler.epoch_steps()
                losses, nips = flow.training_scan(
                    sampler, n_ep * spe, training['lambda_nip'],
                    training['lambda_dcn'], training['augment'], lr)
                l = losses.reshape(n_ep, spe).mean(axis=1)
                ni = nips.reshape(n_ep, spe).mean(axis=1)
                for i in range(n_ep):
                    scan_cache[epoch + i] = (l[i], ni[i])
            return scan_cache.pop(epoch)

        import jax.numpy as jnp
        for epoch in range(training['n_epochs']):
            if sampler is not None:
                fan_mean, nip_mean = scanned_epoch(epoch, learning_rate)
                pending['fan'].append(fan_mean)
                pending['nip'].append(nip_mean)
            else:
                fan_losses, nip_losses = [], []
                for batch in prefetcher:
                    if data._loaded_data == 'xy':
                        batch_x, batch_y = batch
                    else:
                        batch_x = batch
                        batch_y = batch_x

                    comb_loss, comp_loss = flow.training_step(
                        batch_x, batch_y, training['lambda_nip'],
                        training['lambda_dcn'], training['augment'], learning_rate)
                    # keep on device — no per-step host sync (see pending above)
                    fan_losses.append(comb_loss)
                    nip_losses.append(comp_loss['nip'])

                pending['fan'].append(jnp.mean(jnp.stack(fan_losses)))
                pending['nip'].append(jnp.mean(jnp.stack(nip_losses)))

            if epoch % training['validation_schedule'] == 0:
                # deferred NaN-gradient guard + loss materialization: one
                # device->host transfer for the whole window instead of a host
                # sync per step
                flow.assert_finite()
                flush_pending()
                accuracy, conf = validation.validate_fan(flow, data)
                flow.fan.log_metric('accuracy', 'validation', accuracy)
                flow.fan.performance['confusion'] = conf.tolist()

                if flow.is_trainable('nip'):
                    values = validation.validate_nip(flow.nip, data, save_dir, epoch=epoch,
                                                     show_ref=True,
                                                     loss_type=flow.nip.loss_metric)
                    for metric, vals in zip(['ssim', 'psnr', 'loss'], values):
                        flow.nip.log_metric(metric, 'validation', vals)

                if flow.is_trainable('dcn'):
                    from neural_imaging_tpu.models.compression import DCN
                    from neural_imaging_tpu.models.jpeg import JPEG
                    if isinstance(flow.codec, DCN):
                        values = validation.validate_dcn(flow.codec, data, save_dir,
                                                         epoch=epoch, show_ref=True)
                    elif isinstance(flow.codec, JPEG):
                        values = validation.validate_jpeg(flow.codec, data)
                    else:
                        raise NotImplementedError(
                            f'Validation for {flow.codec} codec not implemented')
                    for metric, value in values.items():
                        flow.codec.log_metric(metric, 'validation', value)

                validation.save_training_progress(training_summary, flow, save_dir,
                                                  quiet=True)
                flow.fan.save_model(os.path.join(model_directory, flow.fan.scoped_name),
                                    epoch, quiet=True)
                if flow.nip.count_parameters() > 0:
                    # Snapshot the NIP even when frozen: the FAN was trained on
                    # THIS NIP's output distribution, and re-validation
                    # (test_fan.py::restore_flow) rebuilds the flow from the run
                    # directory alone — without the weights it falls back to a
                    # fresh-initialized NIP and reports shifted accuracies.
                    flow.nip.save_model(os.path.join(model_directory, flow.nip.scoped_name),
                                        epoch, quiet=True)
                if flow.is_trainable('dcn'):
                    # any trainable codec (DCN weights / JPEG qtables) is part
                    # of the run directory's self-contained state
                    flow.codec.save_model(os.path.join(model_directory,
                                                       flow.codec.scoped_name),
                                          epoch, quiet=True)

            if epoch % lr_decay_schedule == 0:
                learning_rate *= lr_decay_rate

            # postfix values refresh at validation points (losses stay on
            # device in between — see pending above)
            if loss_last_k['fan']:
                progress = {'fan': np.mean(loss_last_k['fan']),
                            'acc': flow.fan.performance['accuracy']['validation'][-1]}
                if loss_last_k['nip'] and np.mean(loss_last_k['nip']) > 0:
                    progress['nip'] = round(float(np.mean(loss_last_k['nip'])), 2)
                if flow.nip.performance['psnr']['validation']:
                    progress['psnr'] = flow.nip.performance['psnr']['validation'][-1]
                pbar.set_postfix(**progress)
            pbar.update(1)

    # final validation
    flow.assert_finite()
    flush_pending()
    accuracy, conf = validation.validate_fan(flow, data)
    flow.fan.performance['accuracy']['validation'].append(accuracy)
    flow.fan.performance['confusion'] = conf.tolist()

    if flow.is_trainable('nip'):
        values = validation.validate_nip(flow.nip, data, save_dir, epoch=epoch,
                                         show_ref=True, loss_type='L2')
        for metric, vals in zip(['ssim', 'psnr', 'loss'], values):
            flow.nip.log_metric(metric, 'validation', vals)

    from neural_imaging_tpu.models.compression import DCN
    if flow.is_trainable('dcn') and isinstance(flow.codec, DCN):
        values = validation.validate_dcn(flow.codec, data, save_dir, epoch=epoch,
                                         show_ref=True)
        for metric, value in values.items():
            flow.codec.log_metric(metric, 'validation', value)

    validation.save_training_progress(training_summary, flow, save_dir)
    validation.visualize_manipulation_training(flow, epoch, save_dir)

    logger.info('Saving models...')
    flow.fan.save_model(os.path.join(model_directory, flow.fan.scoped_name), epoch)
    if flow.nip.count_parameters() > 0:
        # Always snapshot the NIP (see the validation-point save above).
        flow.nip.save_model(os.path.join(model_directory, flow.nip.scoped_name), epoch)
    if flow.is_trainable('dcn') and isinstance(flow.codec, DCN):
        flow.codec.save_model(os.path.join(model_directory, flow.codec.scoped_name), epoch)
        source_progress = os.path.join(flow._distribution['compression_params']['dirname'],
                                       flow.codec.scoped_name, 'progress.json')
        if os.path.isfile(source_progress):
            shutil.copyfile(source_progress,
                            os.path.join(model_directory, flow.codec.scoped_name,
                                         'progress.json'))
        else:
            # make the snapshot restorable even without the original training dir
            from neural_imaging_tpu.training.compression import save_progress as dcn_progress
            dcn_progress(flow.codec, data, dict(training),
                         os.path.join(model_directory, flow.codec.scoped_name))

    return model_directory
