"""
Base class for all framework models.

Functional-core / OO-shell design: the compute is a pure flax module applied with
explicit params under jit; this shell provides the reference's TFModel capabilities
(models/tfmodel.py:86-294) — performance-stat history, save/load with a JSON
sidecar, parameter counting, `model_code` / `scoped_name` naming, and the
module/class/preset-level `restore()` factories — on top of an optax optimizer with
a runtime-fed learning rate.

Checkpoints are ``<class>.npz`` files of flattened parameter paths (plus a
``<class>.json`` arg sidecar); the directory layout and the JSON training-log
schema match the reference contract so results tooling can aggregate either tree.
"""
import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from neural_imaging_tpu.utils import utils
from neural_imaging_tpu.utils.utils import logger


def restore(dir_name, module, key=None, patch_size=None, restore_perf=False,
            fetch_stats=False, presets_root='config/presets'):
    """
    Restore a pre-trained model from a training directory (or preset name):
    find the newest ``*.json`` log, instantiate ``training_log['model']`` from
    ``module`` with ``training_log['args']`` and load the weights.
    Parity with ref models/tfmodel.py:16.
    """
    if dir_name is None:
        raise ValueError('model directory cannot be None')

    if not os.path.exists(dir_name):
        preset_file = os.path.join(presets_root, f"{module.__name__.split('.')[-1]}.json")
        if os.path.isfile(preset_file):
            with open(preset_file) as f:
                presets = json.load(f)
            if dir_name in presets:
                logger.info('Found %s in presets: %s', dir_name, presets[dir_name])
                dir_name = presets[dir_name]
            else:
                raise ValueError(f'Directory {dir_name} does not exist & key not found in presets!')
        else:
            raise ValueError(f'Directory {dir_name} does not exist (presets not available)!')

    training_log_path = None
    for filename in Path(dir_name).glob('**/*.json'):
        training_log_path = str(filename)
    if training_log_path is None:
        raise FileNotFoundError(f'Could not find a training log (JSON file) in {dir_name}')

    with open(training_log_path) as f:
        training_log = json.load(f)
    if key is not None and key in training_log:
        # workflow logs (training.json) nest each model under its own key;
        # plain model sidecars keep {model, args} at the top level
        training_log = training_log[key]

    parameters = dict(training_log['args'] or {})
    parameters['patch_size'] = patch_size
    parameters = _parse_tuple_args(parameters)

    model = getattr(module, training_log['model'])(**parameters)
    model.load_model(dir_name)
    logger.info('Restored model: %s <- %s', model.model_code, training_log_path)

    if restore_perf and 'performance' in training_log:
        model.performance = training_log['performance']

    if fetch_stats:
        stats = {}
        for k, v in model.performance.items():
            if isinstance(v, dict):
                if v.get('validation'):
                    stats[k] = round(float(v['validation'][-1]), 3)
                elif v.get('training'):
                    stats[k] = round(float(v['training'][-1]), 3)
        return model, stats
    return model


def _parse_tuple_args(parameters):
    """JSON stores tuple args as strings like '(32, 32)'; parse them back safely."""
    import ast
    out = {}
    for k, v in parameters.items():
        if isinstance(v, str) and len(v) >= 2 and v[0] == '(' and v[-1] == ')':
            try:
                out[k] = ast.literal_eval(v)
                continue
            except (ValueError, SyntaxError):
                pass
        out[k] = v
    return out


class TPUModel:
    """
    Shell around a pure flax module: holds params/opt-state, a jitted train step,
    metric history and the save/load/restore machinery.
    """

    def __init__(self, **kwargs):
        self._module = None
        self.params = None
        self.opt_state = None
        self._jitted = {}
        self.reset_performance_stats()

    # -- performance stats ------------------------------------------------------

    @staticmethod
    def _reset_performance(metric_names):
        return {k: {'training': [], 'validation': []} for k in metric_names}

    def reset_performance_stats(self):
        self.performance = self._reset_performance(['loss'])

    def log_metric(self, metric, scope, value, raw=False):
        if not raw:
            value = float(value) if utils.is_number(value) else float(np.mean(np.asarray(value)))
        self.performance[metric][scope].append(value)

    def pop_metric(self, metric, scope):
        return self.performance[metric][scope][-1]

    # -- parameters ----------------------------------------------------------------

    def init_optimizer(self):
        """(Re)initialize Adam state. The learning rate is fed at each step."""
        self._tx = optax.scale_by_adam()
        self.opt_state = self._tx.init(self.params)

    def optimizer_update(self, grads, opt_state, params, learning_rate):
        """Adam direction scaled by a runtime learning rate (jit-safe)."""
        updates, opt_state = self._tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -learning_rate * u, updates)
        return optax.apply_updates(params, updates), opt_state

    @property
    def parameters(self):
        """Flat list of (path, array) pairs of trainable parameters."""
        if self.params is None:
            return []
        flat = traverse_util.flatten_dict(self.params, sep='/')
        return list(flat.items())

    def count_parameters(self):
        return int(sum(np.prod(np.asarray(v).shape) for _, v in self.parameters))

    def count_parameters_breakdown(self):
        import pandas as pd
        total = max(self.count_parameters(), 1)
        rows = [(name, tuple(np.asarray(v).shape), int(np.prod(np.asarray(v).shape)),
                 round(100 * np.prod(np.asarray(v).shape) / total, 1))
                for name, v in self.parameters]
        return pd.DataFrame(rows, columns=['name', 'shape', 'parameters', 'total'])

    # -- persistence -----------------------------------------------------------------

    def save_model(self, dirname, epoch=0, save_args=False, quiet=False):
        if not dirname.endswith(self.scoped_name):
            dirname = os.path.join(dirname, self.scoped_name)
        os.makedirs(dirname, exist_ok=True)
        stem = os.path.join(dirname, self.class_name.lower())
        if not quiet:
            logger.info('> %s --> %s.npz %s', self.class_name, stem, 'JSON' if save_args else '')

        flat = traverse_util.flatten_dict(self.params or {}, sep='/')
        np.savez(stem + '.npz', **{k: np.asarray(v) for k, v in flat.items()})

        if save_args:
            with open(stem + '.json', 'w') as f:
                json.dump({'model': self.class_name, 'args': self.get_hyperparameters()},
                          f, indent=4)

    def load_model(self, dirname, quiet=False):
        if not dirname.endswith(self.scoped_name):
            dirname = os.path.join(dirname, self.scoped_name)
        filename = os.path.join(dirname, f'{self.class_name.lower()}.npz')
        if not quiet:
            logger.info('> %s <-- %s', self.class_name, filename)
        with np.load(filename) as z:
            flat = {k: z[k] for k in z.files}
        restored = traverse_util.unflatten_dict(flat, sep='/')
        # Keep existing tree structure/dtypes where shapes match. Leaves are
        # committed to device (jnp) at load time: numpy leaves would be
        # re-transferred host->device on EVERY jitted call that consumes them —
        # for a frozen 30 MB UNet inside the joint workflow that was ~5 s/step
        # over a tunneled TPU link vs ~50 ms with device-resident params.
        self.params = jax.tree.map(
            lambda old, new: jnp.asarray(np.asarray(new, dtype=np.asarray(old).dtype)),
            self.params, restored)
        self.init_optimizer()
        self.reset_performance_stats()

    def save_checkpoint(self, dirname, step=0, keep=3):
        """
        Orbax checkpoint of the FULL training state (params + optimizer state) —
        the TPU-native complement to save_model's portable npz weights (SURVEY.md
        §5: checkpoint/resume). Supports sharded arrays on multi-device meshes.
        """
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(dirname, 'orbax'))
        with ocp.CheckpointManager(
                path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)) as mgr:
            mgr.save(step, args=ocp.args.StandardSave(
                {'params': self.params, 'opt_state': self.opt_state}))
        return path

    def load_checkpoint(self, dirname, step=None, sharding=None):
        """Restore params + optimizer state from an orbax checkpoint.

        ``sharding``: optional jax.sharding.Sharding (e.g. replicated over a
        Mesh) — arrays are materialized directly with that placement, so a
        multi-device/multi-host restore never stages the full state through one
        device's memory."""
        import jax
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(dirname, 'orbax'))
        with ocp.CheckpointManager(path) as mgr:
            step = mgr.latest_step() if step is None else step
            target = {'params': self.params, 'opt_state': self.opt_state}
            if sharding is not None:
                target = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype,
                                                   sharding=sharding), target)
            restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
        self.params = restored['params']
        self.opt_state = restored['opt_state']
        return step

    def migrate_model(self, dirname, mapping=None, verbose=False):
        """
        Migrate weights from a checkpoint with different parameter names
        (ref models/tfmodel.py:184): loads the npz and assigns values through a
        {'new/path': 'old/path'} mapping; unmapped params keep their values.
        """
        if not dirname.endswith(self.scoped_name):
            dirname = os.path.join(dirname, self.scoped_name)
        filename = os.path.join(dirname, f'{self.class_name.lower()}.npz')
        with np.load(filename) as z:
            old = {k: z[k] for k in z.files}

        if verbose:
            logger.info('# Variables found in the checkpoint: %s', filename)
            for i, (name, arr) in enumerate(old.items()):
                logger.info('%3d.  %-60s -> %s', i, name, arr.shape)

        flat = traverse_util.flatten_dict(self.params, sep='/')
        for new_name, value in flat.items():
            source = (mapping or {}).get(new_name, new_name if new_name in old else None)
            if source is None or source not in old:
                logger.warning('mapping for %s not found', new_name)
                continue
            if old[source].shape != np.asarray(value).shape:
                raise ValueError(f'{new_name}: shape mismatch '
                                 f'{old[source].shape} vs {np.asarray(value).shape}')
            flat[new_name] = old[source]
            if verbose:
                logger.info('%s <- %s %s', new_name, source, old[source].shape)

        self.params = traverse_util.unflatten_dict(flat, sep='/')
        self.init_optimizer()
        self.reset_performance_stats()

    def show_model(self, patch_size=None, batch_size=1):
        """Tabulated architecture summary (flax) — the TPU-side analog of the
        reference's keras graph visualization (helpers/tf_helpers.py:229)."""
        import flax.linen as nn
        import jax
        import jax.numpy as jnp
        p = patch_size or self.patch_size or 64
        channels = getattr(self, 'in_channels', 3)
        dummy = jnp.zeros((batch_size, p, p, channels), dtype=jnp.float32)
        return nn.tabulate(self._module, jax.random.PRNGKey(0))(dummy)

    @classmethod
    def restore(cls, dir_name, *, key=None, patch_size=None):
        candidates = sorted(Path(dir_name).glob('**/*.json'))
        if not candidates:
            raise FileNotFoundError(f'Could not find a training log (JSON file) in {dir_name}')
        with open(candidates[0]) as f:
            training_log = json.load(f)
        if key is not None:
            training_log = training_log[key]
        parameters = _parse_tuple_args(dict(training_log['args'] or {}))
        if patch_size is not None:
            parameters['patch_size'] = patch_size
        instance = cls(**parameters)
        instance.load_model(dir_name)
        return instance

    # -- naming / docs -----------------------------------------------------------------

    @property
    def class_name(self):
        return type(self).__name__

    @property
    def scoped_name(self):
        return type(self).__name__.lower()

    @property
    def model_code(self):
        raise NotImplementedError()

    def get_hyperparameters(self):
        return self._h.to_json() if hasattr(self, '_h') else None

    def summary(self):
        return f'{self.class_name} model [{self.count_parameters():,} parameters]'

    def summary_compact(self):
        return self.class_name

    def __repr__(self):
        try:
            extra = utils.join_args(self._h.changed_params())
        except Exception:
            extra = ''
        return f'{self.class_name}({extra})'

    def _has_attributes(self, attrs):
        missing = [a for a in attrs if not hasattr(self, a)]
        if missing:
            raise NotImplementedError(f'Expected attributes not found: {missing}')

    def deploy_model(self, dirname, batch_size=1, patch_size=None):
        """
        AOT-export the inference graph for serving: lowers ``process`` to StableHLO
        and writes the portable artifact + an input/weights manifest. (The
        reference's TFModel.deploy_model was left unimplemented,
        models/tfmodel.py:292-294.)
        """
        import jax
        import jax.numpy as jnp

        os.makedirs(dirname, exist_ok=True)
        p = patch_size or self.patch_size or 64
        channels = getattr(self, 'in_channels', 3)
        dummy = jnp.zeros((batch_size, p, p, channels), dtype=jnp.float32)
        lowered = jax.jit(self._apply).lower(self.params, dummy)

        with open(os.path.join(dirname, 'model.stablehlo.mlir'), 'w') as f:
            f.write(lowered.as_text())
        self.save_model(dirname, save_args=True, quiet=True)
        manifest = {
            'model': self.class_name,
            'input_shape': [batch_size, p, p, channels],
            'input_dtype': 'float32',
            'args': self.get_hyperparameters(),
            'format': 'stablehlo + npz weights',
        }
        with open(os.path.join(dirname, 'manifest.json'), 'w') as f:
            json.dump(manifest, f, indent=4)
        return dirname
