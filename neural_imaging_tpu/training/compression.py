"""
DCN (learned codec) training loop.

Capability parity with reference training/compression.py: batch loop with
resize/flip/gamma augmentations, compress/decompress validation round trips with
numpy entropy, thumbnail grids, latent-distribution visualization, early stopping
on SSIM convergence or deterioration, and ``progress.json`` with the
{training_spec, data, codec:{...}} schema consumed by the R/D benchmarking layer.
"""
import os
from collections import deque

import imageio.v2 as imageio
import numpy as np
from tqdm import tqdm

from neural_imaging_tpu.utils import image as image_helpers
from neural_imaging_tpu.utils import jsonlog, metrics, plots, stats


def default_training_spec():
    return {
        'n_epochs': 500,
        'batch_size': 20,
        'patch_size': 64,
        'learning_rate': 1e-4,
        'learning_rate_reduction_schedule': 1000,
        'learning_rate_reduction_factor': 0.5,
        'validation_schedule': 50,
        'convergence_threshold': 1e-4,
        'augmentation_probs': {'resize': 0.0, 'flip_h': 0.5, 'flip_v': 0.5, 'gamma': 0.5},
        'sample_dropout': False,
    }


def visualize_distribution(dcn, data, ax=None, title=None):
    """Empirical latent histogram vs the soft (entropy-estimator) histogram."""
    title = '' if title is None else title + ' '
    if isinstance(data, np.ndarray):
        batch_x = data
    else:
        batch_x = data.next_validation_batch(0, min(100, data.count_validation))
        if isinstance(batch_x, tuple):
            batch_x = batch_x[-1]

    batch_z = np.asarray(dcn.compress(batch_x)).reshape(-1)
    codebook = dcn.get_codebook()

    from neural_imaging_tpu.ops import quantization as quant
    import jax.numpy as jnp
    _, soft_hist = quant.entropy(jnp.asarray(batch_z), codebook, dcn.v, dcn.gamma)
    soft_hist = np.asarray(soft_hist)
    soft_hist = soft_hist / soft_hist.max()

    qmin, qmax = np.floor(codebook[0]), np.ceil(codebook[-1])
    bin_centers = np.arange(qmin - 1, qmax + 1, 0.1)
    bin_boundaries = np.convolve(bin_centers, [0.5, 0.5], mode='valid')
    hist = np.histogram(batch_z, bins=bin_boundaries, density=True)[0]
    hist = hist / max(hist.max(), 1e-9)

    entropy_val = stats.entropy(batch_z, codebook)

    if ax is None:
        from matplotlib.figure import Figure
        ax = Figure(figsize=(10, 2)).gca()
    ax.set_xlim([qmin - 1, qmax + 1])
    ax.stem(bin_centers[1:-1], hist, linefmt='r:', markerfmt='r.')
    ax.bar(codebook, soft_hist, width=(codebook[1] - codebook[0]) / 2, color='b', alpha=0.5)
    ax.set_title(f'{title}QLR histogram (H={entropy_val:.1f})')
    ax.legend(['Quantized values', 'Soft estimate'], loc='upper right')
    return ax.figure


def save_progress(dcn, data, training, out_dir):
    payload = {
        'training_spec': training,
        'data': data.summary(),
        'codec': {
            'model': dcn.class_name,
            'init': repr(dcn),
            'args': dcn.get_hyperparameters(),
            'codebook': dcn.get_codebook().tolist(),
            'performance': dcn.performance,
        },
    }
    jsonlog.save_json(payload, os.path.join(out_dir, 'progress.json'))


def train_dcn(dcn, training, data, directory='./data/models/dcn/playground/',
              overwrite=False, rng=None, scalar_log=True, parallel=None,
              device_data=False, resume=False):
    """Train a DCN; returns the model output directory.

    ``resume``: continue a previous run from its output directory — npz weights
    plus the orbax full-state checkpoint (Adam moments; written at validation
    points), performance history and epoch counter from ``progress.json``, and
    the learning-rate reduction schedule re-applied up to the resume epoch.
    Without the optimizer moments an npz-only restart transiently regresses a
    converged model (measured on the NIP trainer — docs/quality_runs.md), so
    the orbax restore is preferred whenever the checkpoint exists.
    Match: reference train_dcn.py:55 (--resume) — the reference restarts with
    a fresh optimizer; this build restores it.

    ``scalar_log`` appends per-epoch scalars to ``scalars.jsonl`` in the output
    directory — the TPU build's counterpart of the reference's optional
    TensorBoard summaries (training/compression.py:247-274).

    ``parallel``: optional parallel.train.DataParallel — replicates the codec
    over the mesh and shards each training batch on the batch axis (SPMD with
    XLA gradient all-reduces; the reference loop is single-device,
    ref training/compression.py:123).

    ``device_data``: upload the training set to HBM once and run lax.scan
    chunks with in-graph sampling AND in-graph flip/gamma augmentations
    (DCN.training_scan) — one dispatch per chunk. The host-side resize
    augmentation (probability 0 by default) requires the host path."""
    spec = default_training_spec()
    spec.update(training or {})
    training = spec
    rng = rng or np.random.default_rng()
    if parallel is not None:
        parallel.check_batch(training['batch_size'])

    out_dir = os.path.join(directory, dcn.model_code, dcn.scoped_name)
    start_epoch = 0
    if os.path.isdir(out_dir) and resume:
        progress_file = os.path.join(out_dir, 'progress.json')
        if not os.path.isfile(progress_file):
            raise FileNotFoundError(f'Cannot resume: {progress_file} not found')
        print(f'Resuming training from: {progress_file}')
        dcn.load_model(out_dir)
        try:
            step = dcn.load_checkpoint(out_dir)
            print(f'Restored full optimizer state (orbax step {step})')
        except Exception:
            print('No orbax checkpoint — resuming with fresh optimizer state')
        previous = jsonlog.load_json(progress_file)
        dcn.performance = previous['codec']['performance']
        start_epoch = int(previous['training_spec'].get('current_epoch', 0))
    elif os.path.isdir(out_dir) and not overwrite:
        print(f'WARNING Directory {out_dir} exists, skipping... (use overwrite=True)')
        return out_dir

    if parallel is not None:
        # after a potential resume load so restored state gets replicated too
        parallel.distribute(dcn)
        print(f'Training {parallel.describe()}')

    sampler = None
    scan_cache = {}
    if device_data:
        if training['augmentation_probs'].get('resize', 0) > 0:
            raise ValueError('the resize augmentation is host-only; disable it '
                             'or drop --device-data')
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        sampler = DeviceSampler(data, training['batch_size'],
                                training['patch_size'], discard='flat',
                                sharding=(parallel.batch_sharding
                                          if parallel is not None else None))
        print(f'Training from device-resident data ({sampler.n_images} images '
              'in HBM, scanned multi-epoch steps'
              + (f', {parallel.describe()})' if parallel is not None else ')'))

    n_batches = data['training']['y'].shape[0] // training['batch_size']
    v_batches = data['validation']['y'].shape[0] // training['batch_size']
    perf = dcn.performance
    caches = {k: {'training': deque(maxlen=n_batches), 'validation': deque(maxlen=v_batches)}
              for k in ('loss', 'entropy', 'ssim')}
    n_tail = 5
    # re-apply the lr reduction schedule up to the resume epoch (reductions
    # fire at epochs sched, 2*sched, ... — see the loop below)
    learning_rate = training['learning_rate']
    if start_epoch > 0:
        n_reductions = (start_epoch - 1) // training['learning_rate_reduction_schedule']
        learning_rate *= training['learning_rate_reduction_factor'] ** n_reductions

    os.makedirs(out_dir, exist_ok=True)
    print(f'Output directory: {out_dir}', flush=True)

    scalars = None
    if scalar_log:
        from neural_imaging_tpu.utils.profiling import ScalarLog
        scalars = ScalarLog(os.path.join(out_dir, 'scalars.jsonl'))

    # Training metrics stay ON DEVICE between validation points (one stacked
    # host transfer per validation window): materializing them per batch blocks
    # the host on each step and serializes the pipeline — a full RTT per step
    # over a tunneled chip (docs/benchmarks.md "async epoch loop").
    import jax
    import jax.numpy as jnp
    pending = []  # one {loss, ssim, entropy, scaling, lr, epoch} per epoch

    def flush_pending():
        if not pending:
            return
        stacked = {k: jnp.stack([p[k] for p in pending])
                   for k in ('loss', 'ssim', 'entropy', 'scaling')}
        host = {k: np.asarray(jax.device_get(v), dtype=np.float64)
                for k, v in stacked.items()}
        for i, p in enumerate(pending):
            for key in ('loss', 'ssim', 'entropy'):
                perf[key]['training'].append(float(host[key][i]))
            if scalars is not None:
                s = float(host['scaling'][i])
                scalars.log(p['epoch'], loss=float(host['loss'][i]),
                            ssim=float(host['ssim'][i]),
                            entropy=float(host['entropy'][i]), lr=p['lr'],
                            scaling=0.0 if np.isnan(s) else s)
        pending.clear()

    def scanned_epoch(epoch, lr):
        """Train up to the next validation/lr boundary in ONE jitted lax.scan
        (in-graph sampling + augmentation); per-epoch device means from the
        chunk cache."""
        import jax.numpy as jnp
        if epoch not in scan_cache:
            lr_sched = training['learning_rate_reduction_schedule']
            last = epoch
            while not (last % training['validation_schedule'] == 0
                       or (last + 1) % lr_sched == 0
                       or last == training['n_epochs'] - 1):
                last += 1
            remaining = last - epoch + 1
            n_ep = next(k for k in (25, 5, 1) if k <= remaining)
            outs = dcn.training_scan(sampler, n_ep * n_batches, lr,
                                     training['augmentation_probs'])
            for key in ('loss', 'ssim', 'entropy'):
                outs[key] = outs[key].reshape(n_ep, n_batches).mean(axis=1)
            for i in range(n_ep):
                scan_cache[epoch + i] = {k: outs[k][i] for k in outs}
        return scan_cache.pop(epoch)

    with tqdm(total=training['n_epochs'], ncols=160, initial=start_epoch,
              desc=dcn.model_code.split('/')[-1]) as pbar:
        for epoch in range(start_epoch, training['n_epochs']):
            training['current_epoch'] = epoch
            if epoch > 0 and epoch % training['learning_rate_reduction_schedule'] == 0:
                learning_rate *= training['learning_rate_reduction_factor']

            if sampler is not None:
                means = scanned_epoch(epoch, learning_rate)
                pending.append({
                    'loss': means['loss'], 'ssim': means['ssim'],
                    'entropy': means['entropy'],
                    'scaling': (jnp.reshape(dcn.params['latent_scale'], ())
                                if dcn._h.scale_latent else jnp.float32(np.nan)),
                    'lr': learning_rate, 'epoch': epoch})

            for batch_id in (() if sampler is not None else range(n_batches)):
                # random-resize augmentation: sample a larger patch, rescale down
                patch = training['patch_size']
                if rng.uniform() < training['augmentation_probs']['resize']:
                    current_patch = int(rng.integers(patch, 2 * patch))
                else:
                    current_patch = patch
                batch_x = data.next_training_batch(batch_id, training['batch_size'],
                                                   current_patch)
                if isinstance(batch_x, tuple):
                    batch_x = batch_x[-1]
                if current_patch != patch:
                    import cv2
                    batch_x = np.stack([cv2.resize(img, (patch, patch),
                                                   interpolation=cv2.INTER_AREA)
                                        for img in batch_x]).astype(np.float32)

                if rng.uniform() < training['augmentation_probs']['flip_h']:
                    batch_x = batch_x[:, :, ::-1, :]
                if rng.uniform() < training['augmentation_probs']['flip_v']:
                    batch_x = batch_x[:, ::-1, :, :]
                if rng.uniform() < training['augmentation_probs']['gamma']:
                    batch_x = image_helpers.batch_gamma(batch_x, rng=rng)

                batch_x = np.ascontiguousarray(batch_x)
                if parallel is not None:
                    (batch_x,) = parallel.shard(batch_x)
                values = dcn.training_step(batch_x, learning_rate)
                for key, value in values.items():
                    caches[key]['training'].append(value)  # device scalars

            if sampler is None:
                pending.append({
                    'loss': jnp.mean(jnp.stack(list(caches['loss']['training']))),
                    'ssim': jnp.mean(jnp.stack(list(caches['ssim']['training']))),
                    'entropy': jnp.mean(jnp.stack(list(caches['entropy']['training']))),
                    'scaling': (jnp.reshape(dcn.params['latent_scale'], ())
                                if dcn._h.scale_latent else jnp.float32(np.nan)),
                    'lr': learning_rate, 'epoch': epoch})

            if epoch % training['validation_schedule'] == 0:
                flush_pending()
                codebook = dcn.get_codebook()
                for batch_id in range(v_batches):
                    batch_x = data.next_validation_batch(batch_id, training['batch_size'])
                    if isinstance(batch_x, tuple):
                        batch_x = batch_x[-1]
                    batch_z = np.asarray(dcn.compress(batch_x))
                    batch_y = np.asarray(dcn.decompress(batch_z))
                    caches['loss']['validation'].append(float(np.linalg.norm(batch_x - batch_y)))
                    caches['ssim']['validation'].append(
                        metrics.batch(batch_x, batch_y, metrics.ssim))
                    caches['entropy']['validation'].append(stats.entropy(batch_z, codebook))

                for key in ('loss', 'ssim', 'entropy'):
                    perf[key]['validation'].append(float(np.mean(caches[key]['validation'])))

                # thumbnail snapshot (input/output pairs, highest-variance first)
                indices = np.argsort(np.var(batch_x, axis=(1, 2, 3)))[::-1]
                pairs = np.concatenate((batch_x[indices[::2]], batch_y[indices[::2]]), axis=0)
                thumbs = (255 * plots.thumbnails(pairs, ncols=max(training['batch_size'] // 2, 1))
                          ).astype(np.uint8)
                imageio.imsave(os.path.join(out_dir, f'thumbnails-{epoch:05d}.png'), thumbs)

                save_progress(dcn, data, training, out_dir)
                dcn.save_model(out_dir, epoch, quiet=True)
                try:  # full training state (params + Adam moments) so --resume
                    # continues without an optimizer-moment shock
                    dcn.save_checkpoint(out_dir, step=epoch)
                except Exception as e:
                    print(f'orbax checkpoint skipped: {e}')

                v_ssim = perf['ssim']['validation']
                if len(v_ssim) > 5:
                    current = np.mean(v_ssim[-n_tail:])
                    previous = np.mean(v_ssim[-(n_tail + 1):-1])
                    change = abs((current - previous) / previous)
                    if change < training['convergence_threshold']:
                        print(f'Early stopping - model converged, SSIM change {change:.4f}')
                        break
                    if current < 0.9 * previous:
                        print(f'Error - SSIM deterioration by more than 10% '
                              f'{previous:.4f} -> {current:.4f}')
                        break

            # postfix refreshes at validation points (metrics stay on device
            # in between)
            if perf['loss']['training']:
                progress = {
                    'L': np.mean(perf['loss']['training'][-3:]),
                    'lr': f'{learning_rate:.1e}',
                    'H': '{:.1f}'.format(perf['entropy']['training'][-1]),
                }
                if perf['ssim']['validation']:
                    progress['ssim'] = f"{perf['ssim']['validation'][-1]:.2f}"
                if dcn._h.scale_latent and epoch % training['validation_schedule'] == 0:
                    progress['S'] = '{:.1f}'.format(
                        float(np.asarray(dcn.params['latent_scale'])))
                pbar.set_postfix(progress)
            pbar.update(1)

    flush_pending()
    save_progress(dcn, data, training, out_dir)
    dcn.save_model(out_dir, quiet=True)
    if scalars is not None:
        scalars.close()
    return out_dir
