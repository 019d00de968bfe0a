"""
Declarative hyper-parameter schemas with validation.

Capability parity with reference helpers/paramspec.py: a spec maps
``name -> (default, dtype, validation)`` where validation is a 2-tuple range,
a set of allowed values, a regex string (for str dtypes) or a callable.
Values are read via attribute access and written only through ``update()``.
"""
import re
import types

import numpy as np

from neural_imaging_tpu.utils import utils


def item_passes(check):
    def wrapper(items):
        return all(check(i) for i in items)
    return wrapper


def numbers_in_range(dtype, min_value=None, max_value=None):
    """Validator factory for tuple-valued params (ref helpers/paramspec.py:20)."""
    def wrapper(items):
        for i in items:
            if not isinstance(i, dtype):
                return False
            if min_value is not None and i < min_value:
                return False
            if max_value is not None and i > max_value:
                return False
        return True
    return wrapper


class ParamSpec:

    def __init__(self, specs):
        self._validate_specs(specs)
        self.__dict__['_specs'] = dict(specs)
        self.__dict__['_values'] = {}

    @staticmethod
    def _validate_specs(specs):
        for key, spec in specs.items():
            if not isinstance(spec, tuple) or len(spec) != 3:
                raise ValueError(f'Invalid spec for {key!r}: expected (default, dtype, validation)')
            validation = spec[2]
            if validation is None:
                continue
            if spec[1] is str and not isinstance(validation, (str, set, frozenset, types.FunctionType)):
                raise ValueError('String params validate via regex (str), enum (set) or callable')
            if utils.is_numeric_type(spec[1]) and not isinstance(validation, (tuple, set, frozenset)):
                raise ValueError('Numeric params validate via range (2-tuple) or enum (set)')

    def add(self, specs):
        self._validate_specs(specs)
        self._specs.update(specs)

    def __getattr__(self, name):
        if name.startswith('_'):
            raise AttributeError(name)
        values = self.__dict__['_values']
        specs = self.__dict__['_specs']
        if name in values:
            return values[name]
        if name in specs:
            return specs[name][0]
        raise KeyError(name)

    def __setattr__(self, key, value):
        raise ValueError('Values cannot be set directly — use update().')

    def __contains__(self, item):
        return item in self._specs

    def keys(self):
        return list(self._specs.keys())

    def get_dtype(self, name):
        return self._specs[name][1]

    def get_default(self, name):
        return self._specs[name][0]

    def get_value(self, name):
        return getattr(self, name)

    def get_min(self, name):
        v = self._specs[name][2]
        return v[0] if isinstance(v, tuple) and len(v) == 2 else None

    def get_max(self, name):
        v = self._specs[name][2]
        return v[1] if isinstance(v, tuple) and len(v) == 2 else None

    def get_enum(self, name):
        v = self._specs[name][2]
        return set(v) if isinstance(v, (set, frozenset)) else None

    def get_regex(self, name):
        v = self._specs[name][2]
        return v if isinstance(v, str) else None

    def to_dict(self):
        params = {key: spec[0] for key, spec in self._specs.items()}
        params.update(self._values)
        return params

    def to_json(self):
        """JSON-safe dict: tuples (and other non-numbers) are stringified, matching the
        reference's log format where tuple args round-trip through str() + eval
        (ref models/tfmodel.py:62-64)."""
        out = {}
        for k, v in self.to_dict().items():
            if utils.is_number(v) or isinstance(v, (bool, str)) or v is None:
                out[k] = v
            else:
                out[k] = str(v)
        return out

    def changed_params(self):
        return {k: v for k, v in self._values.items() if self._specs[k][0] != v}

    def __repr__(self):
        return f'{type(self).__name__}({self.to_dict()})'

    def update(self, **params):
        for key, value in params.items():
            if key not in self._specs:
                raise ValueError(f'Unexpected parameter: {key}!')
            _, dtype, validation = self._specs[key]
            if value is None:
                continue
            if utils.is_number(value) and np.isnan(value):
                raise ValueError(f'Invalid value {value} for attribute {key}')

            candidate = value if dtype is None else dtype(value)

            if validation is not None:
                if isinstance(validation, tuple) and len(validation) == 2:
                    lo, hi = validation
                    if lo is not None and candidate < lo:
                        raise ValueError(f'{key}: {candidate} fails minimum check (>= {lo})')
                    if hi is not None and candidate > hi:
                        raise ValueError(f'{key}: {candidate} fails maximum check (<= {hi})')
                elif isinstance(validation, (set, frozenset)):
                    if candidate not in validation:
                        raise ValueError(f'{key}: {candidate!r} is not an allowed value ({validation})')
                elif isinstance(validation, str) and dtype is str:
                    if re.search(validation, candidate) is None:
                        raise ValueError(f'{key}: {candidate!r} does not match regex {validation!r}')
                elif callable(validation):
                    if not validation(candidate):
                        raise ValueError(f'{key}: {candidate!r} failed custom validation')

            self._values[key] = candidate
        return self
