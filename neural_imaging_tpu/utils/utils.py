"""
Generic helpers: logging setup, numeric checks, number formatting, fuzzy CLI option
matching, dict pretty-printing and a subprocess wrapper.

Capability parity with reference helpers/utils.py (see SURVEY.md §2.15); implemented
on the stdlib (the reference used loguru, which is not part of this stack).
"""
import logging
import math
import numbers
import shlex
import subprocess
import sys

import numpy as np

_LOG_FORMAT = '%(asctime)s | %(levelname)-7s | %(name)s:%(funcName)s:%(lineno)d - %(message)s'

logger = logging.getLogger('neural_imaging_tpu')


def setup_logging(level=logging.INFO, stream=None):
    """Configure compact console logging for the framework (ref helpers/utils.py:30)."""
    handler = logging.StreamHandler(stream or sys.stderr)
    handler.setFormatter(logging.Formatter(_LOG_FORMAT, datefmt='%H:%M:%S'))
    root = logging.getLogger('neural_imaging_tpu')
    root.handlers.clear()
    root.addHandler(handler)
    root.setLevel(level)
    return root


def is_number(value):
    """True for ints/floats/numpy scalars; excludes bools and NaN-safe types are allowed."""
    if isinstance(value, bool):
        return False
    if isinstance(value, numbers.Number):
        return True
    if isinstance(value, np.generic) and np.issubdtype(type(value), np.number):
        return True
    return False


def is_numeric_type(t):
    """True if t is a numeric *type* (int, float, numpy number classes)."""
    if t in (int, float, complex):
        return True
    try:
        return issubclass(t, (numbers.Number, np.number))
    except TypeError:
        return False


def is_nan(value):
    try:
        return math.isnan(value)
    except (TypeError, ValueError):
        return False


def format_number(value, sig=3):
    """Format a number compactly with a sensible number of significant digits."""
    if value is None:
        return 'None'
    if not is_number(value):
        return str(value)
    if float(value) == int(value) and abs(value) < 1e6:
        return str(int(value))
    if value == 0:
        return '0'
    magnitude = int(math.floor(math.log10(abs(value))))
    digits = max(0, sig - 1 - magnitude)
    return '{:.{d}f}'.format(value, d=min(digits, 12))


def format_patch_shape(shape):
    if shape is None:
        return '(any)'
    return '(' + ', '.join('?' if s is None else str(s) for s in tuple(shape)) + ')'


def join_args(d):
    return ', '.join(f'{k}={v}' for k, v in d.items())


def levenshtein(a, b):
    """Edit distance between two strings (for fuzzy CLI option matching)."""
    if len(a) < len(b):
        a, b = b, a
    previous = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        current = [i + 1]
        for j, cb in enumerate(b):
            current.append(min(previous[j + 1] + 1, current[j] + 1, previous[j] + (ca != cb)))
        previous = current
    return previous[-1]


def match_option(value, options, threshold=3):
    """
    Fuzzy-match a CLI-provided value against a set of valid options
    (ref helpers/utils.py:107). Returns the best match, or raises ValueError.
    """
    options = list(options)
    if value in options:
        return value
    prefixed = [o for o in options if o.startswith(value)]
    if len(prefixed) == 1:
        return prefixed[0]
    distances = [(levenshtein(value, o), o) for o in options]
    distances.sort()
    if distances and distances[0][0] <= threshold:
        return distances[0][1]
    raise ValueError(f'Could not match option {value!r}; available: {options}')


def get(dictionary, path, sep='/'):
    """Recursive dict lookup with a path string, e.g. get(d, 'performance/psnr/validation')."""
    node = dictionary
    for key in path.split(sep):
        if not key:
            continue
        node = node[key]
    return node


def printd(d, indent=0, file=sys.stdout):
    """Pretty-print a (nested) dictionary."""
    pad = '  ' * indent
    for k, v in d.items():
        if isinstance(v, dict):
            print(f'{pad}{k}:', file=file)
            printd(v, indent + 1, file=file)
        else:
            print(f'{pad}{k}: {v}', file=file)


def shell(command, verbose=False):
    """
    Run a shell command, capture output; returns (returncode, stdout+stderr lines).
    Parity with ref helpers/utils.py:266 used by the E2E framework test harness.
    """
    if isinstance(command, str):
        command = shlex.split(command)
    if verbose:
        logger.info('$ %s', ' '.join(command))
    proc = subprocess.run(command, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    lines = proc.stdout.splitlines()
    if verbose:
        for line in lines:
            logger.info('  %s', line)
    return proc.returncode, lines


def log_call(fn):
    """Decorator logging each call with its arguments (ref helpers/utils.py:126)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        arg_str = ', '.join([repr(a) for a in args] +
                            [f'{k}={v!r}' for k, v in kwargs.items()])
        if len(arg_str) > 200:
            arg_str = arg_str[:200] + '…'
        logger.debug('%s(%s)', fn.__name__, arg_str)
        return fn(*args, **kwargs)
    return wrapper


def log_timing(fn):
    """Decorator logging wall-clock duration of each call."""
    import functools
    import time

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        result = fn(*args, **kwargs)
        logger.debug('%s took %.3f s', fn.__name__, time.perf_counter() - t0)
        return result
    return wrapper


def is_interactive():
    try:
        get_ipython  # noqa: F821
        return True
    except NameError:
        return hasattr(sys, 'ps1')
