"""
JSON training-log contract.

The reference serializes per-model metric history + hyper-params to ``progress.json``
(training/pipeline.py:91-102) and nested workflow state to ``training.json``
(training/validation.py:301-352); that schema is API — the results/aggregation layer
and the E2E framework test both parse it. This module is the single writer/reader for
those files in the TPU build.
"""
import json
import os

import numpy as np


def _to_jsonable(obj):
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if hasattr(obj, 'item') and callable(obj.item) and getattr(obj, 'ndim', None) == 0:
        return obj.item()  # jax scalars
    return obj


def save_json(payload, filename):
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, 'w') as f:
        json.dump(_to_jsonable(payload), f, indent=4)


def load_json(filename):
    with open(filename) as f:
        return json.load(f)


def save_progress(model, training_summary, out_directory):
    """Write ``progress.json`` with the reference schema:
    {performance, args, model, init, summary}."""
    payload = {
        'performance': model.performance,
        'args': model.get_hyperparameters(),
        'model': model.class_name,
        'init': repr(model),
        'summary': _to_jsonable(training_summary),
    }
    save_json(payload, os.path.join(out_directory, 'progress.json'))
    return payload


def load_progress(out_directory):
    return load_json(os.path.join(out_directory, 'progress.json'))
