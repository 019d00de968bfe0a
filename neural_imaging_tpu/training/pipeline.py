"""
NIP (camera ISP) training loop.

Capability parity with reference training/pipeline.py: epoch x batch loop over a
jitted train step, periodic validation with PSNR/SSIM + thumbnail sheets,
``progress.json`` logging, checkpointing (optionally best-only), learning-rate
back-off on validation regression, early stopping on convergence, and --resume.
"""
import os
from collections import OrderedDict, deque

import numpy as np
from tqdm import tqdm

from neural_imaging_tpu.utils import jsonlog, metrics, plots
from neural_imaging_tpu.utils.jsonlog import save_progress  # re-export (ref pipeline.py:91)

TQDM_WIDTH = 120


def validate(model, data, out_directory, savefig=False, epoch=0, show_ref=False,
             loss_metric='L2'):
    """Develop the validation set; returns (ssims, psnrs, losses, developed)."""
    if loss_metric not in ('L2', 'L1', 'SSIM', 'MS-SSIM'):
        raise ValueError(f'Unsupported loss ({loss_metric})!')

    example_x, example_y = data.next_validation_batch(0, data.count_validation)
    developed = np.asarray(model.process(example_x)).clip(0, 1)

    ssims, psnrs, losses = [], [], []
    for b in range(data.count_validation):
        reference, dev = example_y[b], developed[b]
        ssim = float(metrics.ssim(reference, dev))
        psnr = float(metrics.psnr(reference, dev))
        if loss_metric == 'L2':
            loss = metrics.mse(255 * reference, 255 * dev)
        elif loss_metric == 'L1':
            loss = metrics.mae(255 * reference, 255 * dev)
        else:
            loss = 255 * (1 - ssim)
        ssims.append(ssim)
        psnrs.append(psnr)
        losses.append(loss)

    if savefig:
        fig, axes = plots.sub(data.count_validation, figwidth=20)
        for b in range(data.count_validation):
            plots.image(np.concatenate((example_y[b], developed[b]), axis=1) if show_ref
                        else developed[b],
                        f'{psnrs[b]:.1f} dB / {ssims[b]:.2f}', axes=axes[b])
        plots.save_figure(fig, os.path.join(out_directory, f'validation_{epoch:05d}.jpg'),
                          dpi=150)

    return ssims, psnrs, losses, developed


def show_progress(model, out_directory):
    fig = plots.perf(model.performance)
    fig.suptitle(model.model_code)
    plots.save_figure(fig, os.path.join(out_directory, 'progress.png'), dpi=150)


def train_nip_model(model, camera_name, n_epochs=10000, lr_schedule=None,
                    validation_loss_threshold=1e-3, validation_schedule=100,
                    resume=False, patch_size=64, batch_size=20, data=None,
                    out_directory_root='./data/models/nip', save_best=False,
                    discard='flat', parallel=None, device_data=False):
    """``parallel``: optional parallel.train.DataParallel — replicates the model
    over the mesh and lands every training batch pre-sharded on the batch axis,
    so the same jitted step runs SPMD with gradient all-reduces over ICI.

    ``device_data``: upload the full training set to HBM once and sample
    patches in-graph (zero host→device traffic per step — the fastest path;
    data.device_sampler.DeviceSampler). Composes with ``parallel``: the images
    are replicated over the mesh and the sampled batch is shard-constrained on
    its leading axis, so the scanned steps run SPMD."""
    if data is None:
        raise ValueError('Training data seems not to be loaded!')
    if parallel is not None:
        parallel.check_batch(batch_size)
    # Multi-host: every process runs the SAME program (SPMD multi-controller)
    # on the same deterministic dataset; only the primary writes artifacts.
    # Validation metrics are identical across processes, so the lr back-off /
    # early-stop control flow stays in lockstep without synchronization.
    from neural_imaging_tpu.parallel import multihost
    primary = multihost.is_primary()

    # sanity-check the dataset interface before entering the loop
    try:
        probe = min(5, data.count_training)
        bx, by = data.next_training_batch(0, probe, patch_size * 2)
        if bx.shape != (probe, patch_size, patch_size, 4) or \
                by.shape != (probe, 2 * patch_size, 2 * patch_size, 3):
            raise ValueError('The training batch returned by the dataset is of invalid size!')
    except Exception as e:
        raise ValueError(f'Data set error: {e}')

    if batch_size > data.count_training or batch_size > data.count_validation:
        raise ValueError(f'Batch size ({batch_size}) exceeds dataset size '
                         f'({data.count_training}/{data.count_validation})!')

    out_directory = os.path.join(out_directory_root, camera_name, model.model_code,
                                 model.scoped_name)
    if os.path.exists(out_directory) and not resume:
        print(f'WARNING directory {out_directory} exists, skipping...')
        return out_directory

    n_batches = data.count_training // batch_size
    n_tail = 5

    if not resume:
        start_epoch = 0
    else:
        summary_file = os.path.join(out_directory, 'progress.json')
        if not os.path.isfile(summary_file):
            raise FileNotFoundError(f'Could not open file {summary_file}')
        print(f'Resuming training from: {summary_file}')
        model.load_model(out_directory)
        # Full-state resume: restore the optimizer state too when an orbax
        # checkpoint exists (written at validation points below). An npz-only
        # resume resets Adam's moments, which transiently REGRESSES a
        # converged model by several dB for hundreds of epochs (measured:
        # 35.0 -> 31.2 dB after a UNet resume) — and can trip the convergence
        # check during the recovery.
        try:
            step = model.load_checkpoint(out_directory)
            print(f'Restored full optimizer state (orbax step {step})')
        except Exception:
            print('No orbax checkpoint — resuming with fresh optimizer state')
        summary_data = jsonlog.load_json(summary_file)
        model.performance = summary_data['performance']
        start_epoch = summary_data['summary']['Epoch']

    if parallel is not None:
        # after a potential resume load so restored weights get replicated too
        parallel.distribute(model)
        print(f'Training {parallel.describe()}')

    if lr_schedule is None:
        lr_schedule = {0: 1e-4}
    elif isinstance(lr_schedule, float):
        lr_schedule = {0: lr_schedule}
    lr_schedule = {int(k): v for k, v in lr_schedule.items()}

    training_summary = OrderedDict()
    training_summary['Camera'] = camera_name
    training_summary['Architecture'] = model.summary()
    training_summary['Max epochs'] = n_epochs
    training_summary['Learning rate'] = {str(k): v for k, v in lr_schedule.items()}
    training_summary['Training data size'] = str(data['training'][data._loaded_data[0]].shape)
    training_summary['Validation data size'] = str(data['validation'][data._loaded_data[0]].shape)
    training_summary['# batches'] = n_batches
    training_summary['Patch size'] = patch_size
    training_summary['Batch size'] = batch_size
    training_summary['Validation schedule'] = validation_schedule
    training_summary['Start epoch'] = start_epoch
    training_summary['Saved checkpoint'] = None
    training_summary['Discarding policy'] = discard
    training_summary['Output directory'] = out_directory

    print('\n## Training summary')
    for k, v in training_summary.items():
        print(f'{k:30s}: {v}')
    print('', flush=True)

    # on resume, start from the schedule entry in effect at start_epoch
    past = [k for k in lr_schedule if k <= start_epoch]
    learning_rate = lr_schedule[max(past)] if past else 1e-4
    progress_dict = {}
    epoch = start_epoch

    # Per-epoch training losses stay ON DEVICE between validation points — a
    # host materialization blocks on the step result and serializes the
    # pipeline (a full RTT per sync on a tunneled chip; docs/benchmarks.md
    # "async epoch loop"). One stacked transfer per validation window instead.
    import jax
    import jax.numpy as jnp
    pending_losses = []

    def flush_pending():
        if pending_losses:
            for v in np.asarray(jax.device_get(jnp.stack(pending_losses)),
                                dtype=np.float64):
                model.log_metric('loss', 'training', float(v))
            pending_losses.clear()

    sampler = None
    scan_cache = {}
    if device_data:
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        sampler = DeviceSampler(data, batch_size, 2 * patch_size, discard=discard,
                                sharding=(parallel.batch_sharding
                                          if parallel is not None else None))
        print(f'Training from device-resident data ({sampler.n_images} images in '
              'HBM, scanned multi-epoch steps'
              + (f', {parallel.describe()})' if parallel is not None else ')'))

    def scanned_epoch(epoch, lr):
        """Train up to the next validation/lr-schedule boundary in ONE jitted
        lax.scan with in-graph sampling; returns this epoch's device-mean loss
        from the chunk cache."""
        if epoch not in scan_cache:
            last = epoch
            while not (last % validation_schedule == 0
                       or (last + 1) in lr_schedule
                       or last == n_epochs - 1):
                last += 1
            # fixed ladder of scan lengths so only ~3 distinct programs ever
            # compile, whatever the validation/lr schedules are
            remaining = last - epoch + 1
            n_ep = next(k for k in (25, 5, 1) if k <= remaining)
            spe = sampler.epoch_steps()
            losses = model.training_scan(sampler, n_ep * spe, lr)
            means = losses.reshape(n_ep, spe).mean(axis=1)
            for i in range(n_ep):
                scan_cache[epoch + i] = means[i]
        return scan_cache.pop(epoch)

    with tqdm(total=n_epochs, ncols=TQDM_WIDTH,
              desc=f'{model.model_code} for {camera_name}') as pbar:
        pbar.update(start_epoch)

        for epoch in range(start_epoch, n_epochs):
            if epoch in lr_schedule:
                learning_rate = lr_schedule[epoch]

            if sampler is not None:
                pending_losses.append(scanned_epoch(epoch, learning_rate))
            else:
                loss_local = []
                from neural_imaging_tpu.data.prefetch import EpochPrefetcher
                sharding = parallel.batch_sharding if parallel is not None else None
                for bx, by in EpochPrefetcher(data, batch_size, 2 * patch_size,
                                              discard, sharding=sharding,
                                              quantized=True):
                    loss = model.training_step(bx, by, learning_rate)
                    loss_local.append(loss)  # device scalar — no host sync here
                pending_losses.append(jnp.mean(jnp.stack(loss_local)))

            if epoch % validation_schedule == 0:
                flush_pending()
                ssims, psnrs, v_losses, _ = validate(model, data, out_directory,
                                                     primary, epoch, True,
                                                     model.loss_metric)
                model.log_metric('ssim', 'validation', ssims)
                model.log_metric('psnr', 'validation', psnrs)
                model.log_metric('loss', 'validation', v_losses)

                training_summary['Epoch'] = epoch
                if primary:
                    save_progress(model, training_summary, out_directory)

                val_losses = model.performance['loss']['validation']
                if not save_best or (len(val_losses) > 2 and val_losses[-1] <= min(val_losses)):
                    training_summary['Saved checkpoint'] = epoch
                    if primary:
                        model.save_model(out_directory, epoch, quiet=True)
                    try:  # full training state (params + Adam moments) for
                        # shock-free resume; portable npz stays the contract.
                        # Orbax must run on EVERY process — it synchronizes
                        # across hosts internally (a primary-only call leaves
                        # the others at the next train step's all-reduce:
                        # cross-process deadlock, measured via gloo timeouts
                        # in tests/test_multihost.py)
                        model.save_checkpoint(out_directory, step=epoch)
                    except Exception as e:
                        print(f'orbax checkpoint skipped: {e}')

                # drop the learning rate if the model deteriorated by > 20%
                if len(val_losses) > 5 and val_losses[-1] > 1.2 * min(val_losses):
                    learning_rate = max(learning_rate * 0.95, 1e-7)

                # convergence check
                if validation_loss_threshold is not None and len(val_losses) > 10:
                    current = np.mean(val_losses[-n_tail:-1])
                    previous = np.mean(val_losses[-(n_tail + 1):-2])
                    vloss_change = abs((current - previous) / previous)
                    if vloss_change < validation_loss_threshold:
                        print(f'Early stopping - model converged, validation loss '
                              f'change {vloss_change}')
                        break

                progress_dict = {'psnr': model.pop_metric('psnr', 'validation'),
                                 'ssim': model.pop_metric('ssim', 'validation')}

            # postfix refreshes at validation points (losses stay on device in
            # between)
            if model.performance['loss']['training']:
                pbar.set_postfix(loss=model.pop_metric('loss', 'training'),
                                 **progress_dict)
            pbar.update(1)

    flush_pending()
    training_summary['Epoch'] = epoch
    val_losses = model.performance['loss']['validation']
    if not save_best or (val_losses and val_losses[-1] <= min(val_losses)):
        training_summary['Saved checkpoint'] = epoch
        if primary:
            model.save_model(out_directory, epoch)
    if primary:
        show_progress(model, out_directory)
        save_progress(model, training_summary, out_directory)
    return out_directory
