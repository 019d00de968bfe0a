#!/usr/bin/env python3
"""
Same-host CPU measurement of the reference TF2 implementation vs this repo.

The headline bench (bench.py) reports `vs_baseline` against an ESTIMATED TF2-GPU
figure because the reference publishes no throughput numbers (BASELINE.md). This
script grounds the comparison with a measurement that needs no GPU: it runs the
reference's own joint training step (ref workflows/manipulation_classification.py:260-285,
executed from /root/reference unmodified, with import shims for packages absent in
this environment) and this repo's equivalent step on the SAME host CPU at the SAME
configuration (batch, raw patch 128, INet, 5 classes, pool:2 + soft JPEG-50,
NIP+FAN trainable, lambda_nip=0.1), and reports the ratio.

Usage:
    python bench_reference.py reference [--batch N]   # time the reference TF step
    python bench_reference.py ours [--batch N]        # time this repo's step (CPU)
    python bench_reference.py [--batch N]             # both (subprocesses) + ratio,
                                                      # writes docs/measured_baseline.json

Both arms run single-threaded-unpinned on the host CPU: TF and XLA:CPU each use
their default thread pools on the same machine, so the ratio folds in each
framework's own parallelization — which is part of what is being compared.

The default batch is 4 (not the TPU bench's 20): the reference's eager step at
batch 20 exceeds several minutes/step on CPU, making a multi-iteration timing
window impractical; both arms use the identical batch so the ratio is still
like-for-like, and `ours` additionally reports the TPU-config batch-20 number
for context.
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
REFERENCE = '/root/reference'

RAW_PATCH = 128
LAMBDA_NIP = 0.1
LEARNING_RATE = 1e-4


def _timing_window(step_fn, warmup=1, min_iters=3, min_seconds=20.0):
    """Run `step_fn` until at least `min_iters` and `min_seconds` are covered;
    return steps/s. One warmup step absorbs tracing/compilation."""
    for _ in range(warmup):
        step_fn()
    iters = 0
    t0 = time.perf_counter()
    while True:
        step_fn()
        iters += 1
        elapsed = time.perf_counter() - t0
        if iters >= min_iters and elapsed >= min_seconds:
            return iters / elapsed


def _make_batches(batch):
    import numpy as np
    rng = np.random.default_rng(0)
    bx = rng.random((batch, RAW_PATCH, RAW_PATCH, 4)).astype(np.float32)
    by = rng.random((batch, 2 * RAW_PATCH, 2 * RAW_PATCH, 3)).astype(np.float32)
    return bx, by


# ------------------------------------------------------------------------------
# Reference arm
# ------------------------------------------------------------------------------

def _install_reference_shims():
    """Stub the reference's unavailable third-party imports (loguru, skimage,
    jpylyzer, colour_demosaicing, rawkit, pyfse). None of them participate in
    the joint training step being timed — they are import-time dependencies of
    modules the workflow pulls in (RAW development, JPEG payload analysis, the
    FSE entropy codec used only by the DCN bitstream writer)."""
    import types
    import numpy as np

    # The reference targets numpy 1.18 (requirements.txt); restore the scalar
    # aliases numpy 2.x removed so its modules import unmodified.
    for alias, target in (('bool', bool), ('int', int), ('float', float),
                          ('complex', complex), ('object', object), ('str', str)):
        if not hasattr(np, alias):
            setattr(np, alias, target)

    # scipy >= 1.13 moved signal.gaussian to signal.windows.gaussian; the
    # reference (scipy 1.4 era) uses the old location (ref helpers/kernels.py:96)
    from scipy import signal
    if not hasattr(signal, 'gaussian'):
        signal.gaussian = signal.windows.gaussian

    def module(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    class _Logger:
        def _log(self, *a, **k):
            pass
        debug = info = warning = error = critical = exception = _log

    module('loguru', logger=_Logger())

    def _unavailable(*_a, **_k):
        raise RuntimeError('shimmed dependency — not available in this environment')

    skimage = module('skimage')
    skimage.measure = module('skimage.measure', compare_ssim=_unavailable,
                             compare_psnr=_unavailable)
    skimage.metrics = module('skimage.metrics',
                             structural_similarity=_unavailable,
                             peak_signal_noise_ratio=_unavailable)
    module('jpylyzer').jpylyzer = module('jpylyzer.jpylyzer',
                                         checkOneFile=_unavailable)
    module('colour_demosaicing',
           demosaicing_CFA_Bayer_bilinear=_unavailable,
           demosaicing_CFA_Bayer_Menon2007=_unavailable)
    module('rawkit').raw = module('rawkit.raw', Raw=_unavailable)
    module('pyfse').pyfse = module('pyfse.pyfse',
                                   easy_compress=_unavailable,
                                   easy_decompress=_unavailable)
    if 'Levenshtein' not in sys.modules:
        try:
            import Levenshtein  # noqa: F401
        except ImportError:
            module('Levenshtein', distance=lambda a, b: abs(len(a) - len(b)))


def run_reference(batch, min_seconds):
    # The reference builds Keras *functional* models by threading keras Inputs
    # through raw tf ops (ref models/pipelines.py:277) — legal in the Keras 2 it
    # was written against, rejected by Keras 3. tf_keras (the maintained Keras 2
    # fork) is installed; route tf.keras to it so the reference runs unmodified.
    os.environ['TF_USE_LEGACY_KERAS'] = '1'
    os.chdir(REFERENCE)
    sys.path.insert(0, REFERENCE)
    _install_reference_shims()

    import tensorflow as tf
    import numpy as np

    # numpy 2 (NEP 50) promotes float32 * np.int64-scalar to float64, so the
    # reference's jpeg_qtable (ref compression/jpeg_helpers.py:264) now returns
    # float64 where numpy 1.18's value-based casting kept float32 — restore the
    # original dtype before models.jpeg binds the symbol.
    from compression import jpeg_helpers as ref_jpeg_helpers
    _orig_qtable = ref_jpeg_helpers.jpeg_qtable
    ref_jpeg_helpers.jpeg_qtable = (
        lambda quality, channel=0: _orig_qtable(quality, channel).astype(np.float32))

    from workflows import manipulation_classification as mc

    flow = mc.ManipulationClassification(
        'INet',
        manipulations=['sharpen', 'resample', 'gaussian', 'jpeg'],
        distribution={'downsampling': 'pool:2', 'compression': 'jpeg',
                      'compression_params': {'quality': 50, 'codec': 'soft'}},
        # the reference defaults fan_args to None then **-splats it (ctor bug,
        # SURVEY §2.8) — pass {} explicitly
        fan_args={},
        trainable={'nip'},
        raw_patch_size=RAW_PATCH)

    # TF >= 2.16 (Keras 3) optimizers dropped the `.lr` alias the reference's
    # training_step assigns through (ref workflows/manipulation_classification.py:279);
    # alias it back so the reference code runs unmodified.
    opt = flow._optimizer
    if not hasattr(opt, 'lr'):
        try:
            opt.lr = opt.learning_rate
        except AttributeError:
            type(opt).lr = property(lambda self: self.learning_rate)

    bx, by = _make_batches(batch)
    bx_t = tf.convert_to_tensor(bx)
    by_t = tf.convert_to_tensor(by)

    def step():
        loss, _ = flow.training_step(bx_t, by_t, lambda_nip=LAMBDA_NIP,
                                     learning_rate=LEARNING_RATE)
        return float(loss)

    steps_per_sec = _timing_window(step, min_seconds=min_seconds)
    print(json.dumps({'arm': 'reference', 'framework': f'tensorflow {tf.__version__}',
                      'batch': batch, 'raw_patch': RAW_PATCH,
                      'steps_per_sec': round(steps_per_sec, 4)}))


# ------------------------------------------------------------------------------
# Our arm
# ------------------------------------------------------------------------------

def run_ours(batch, min_seconds):
    os.environ.setdefault('NI_TPU_PLATFORM', 'cpu')
    sys.path.insert(0, REPO)
    from neural_imaging_tpu.utils.runtime import configure_jax
    configure_jax()
    import jax
    from neural_imaging_tpu.workflows import ManipulationClassification

    flow = ManipulationClassification(
        'INet',
        manipulations=['sharpen', 'resample', 'gaussian', 'jpeg'],
        distribution={'downsampling': 'pool:2', 'compression': 'jpeg',
                      'compression_params': {'quality': 50, 'codec': 'soft'}},
        trainable={'nip'},
        raw_patch_size=RAW_PATCH)
    # keep the per-step NaN guard ON: the reference's step checks every gradient
    # tensor each step, so the like-for-like arm must pay the equivalent cost

    bx, by = _make_batches(batch)
    bx = jax.device_put(bx)
    by = jax.device_put(by)

    def step():
        loss, _ = flow.training_step(bx, by, lambda_nip=LAMBDA_NIP,
                                     learning_rate=LEARNING_RATE)
        jax.block_until_ready(loss)
        return float(loss)

    steps_per_sec = _timing_window(step, min_seconds=min_seconds)
    print(json.dumps({'arm': 'ours', 'framework': f'jax {jax.__version__} (cpu)',
                      'batch': batch, 'raw_patch': RAW_PATCH,
                      'steps_per_sec': round(steps_per_sec, 4)}))


# ------------------------------------------------------------------------------
# Driver
# ------------------------------------------------------------------------------

def run_both(batch, min_seconds):
    results = {}
    for arm in ('reference', 'ours'):
        env = dict(os.environ)
        if arm == 'ours':
            env['NI_TPU_PLATFORM'] = 'cpu'
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), arm, '--batch', str(batch),
             '--min-seconds', str(min_seconds)],
            capture_output=True, text=True, env=env, timeout=3600)
        line = [l for l in out.stdout.splitlines() if l.startswith('{')]
        if out.returncode != 0 or not line:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-4000:], file=sys.stderr)
            raise RuntimeError(f'{arm} arm failed (rc={out.returncode})')
        results[arm] = json.loads(line[-1])

    ratio = results['ours']['steps_per_sec'] / results['reference']['steps_per_sec']
    summary = {
        'metric': 'joint train step, same-host CPU, reference TF2 vs this repo',
        'batch': batch, 'raw_patch': RAW_PATCH,
        'reference_steps_per_sec': results['reference']['steps_per_sec'],
        'reference_framework': results['reference']['framework'],
        'ours_steps_per_sec': results['ours']['steps_per_sec'],
        'ours_framework': results['ours']['framework'],
        'measured_cpu_ratio': round(ratio, 2),
    }
    out_path = os.path.join(REPO, 'docs', 'measured_baseline.json')
    merged = {'metric': summary['metric'], 'configs': {}}
    if os.path.isfile(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
            merged['configs'] = prev.get('configs', {})
            if 'batch' in prev and 'configs' not in prev:  # pre-merge format
                merged['configs'][f"batch{prev['batch']}"] = prev
        except (json.JSONDecodeError, OSError):
            pass
    merged['configs'][f'batch{batch}'] = summary
    with open(out_path, 'w') as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(summary))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('arm', nargs='?', choices=['reference', 'ours'])
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--min-seconds', type=float, default=20.0)
    args = ap.parse_args()
    if args.arm == 'reference':
        run_reference(args.batch, args.min_seconds)
    elif args.arm == 'ours':
        run_ours(args.batch, args.min_seconds)
    else:
        run_both(args.batch, args.min_seconds)


if __name__ == '__main__':
    main()
