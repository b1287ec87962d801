"""Structural QType system over the flat sample axis.

Re-design of reference mlmc/quantity/quantity_types.py:9-246. QTypes are pure
host metadata that map named/hierarchical access onto slices of the flattened
M axis of a level chunk ``[M, N, 2]``. The only device work is in
``TimeSeriesType.time_interpolation`` which lowers to ``jnp.interp``-style
linear interpolation (traceable under jit) instead of scipy.interp1d.
"""
import abc
import copy
import numpy as np
from typing import List, Tuple


class QType(metaclass=abc.ABCMeta):
    def __init__(self, qtype):
        self._qtype = qtype

    def size(self) -> int:
        """Flattened size of the type."""
        raise NotImplementedError

    def base_qtype(self):
        return self._qtype.base_qtype()

    def replace_scalar(self, substitute_qtype):
        """Replace the leaf ScalarType with ``substitute_qtype`` (deep copy)."""
        inner_qtype = self._qtype.replace_scalar(substitute_qtype)
        new_qtype = copy.deepcopy(self)
        new_qtype._qtype = inner_qtype
        return new_qtype

    @staticmethod
    def keep_dims(chunk):
        """Normalize a chunk to shape [M, N, 2] (reference quantity_types.py:33-49)."""
        if chunk.ndim == 2:
            chunk = chunk[None, :]
        elif chunk.ndim > 2:
            chunk = chunk.reshape((int(np.prod(chunk.shape[:-2])),) + chunk.shape[-2:])
        else:
            raise ValueError("Chunk shape not supported")
        return chunk

    def _make_getitem_op(self, chunk, key):
        return QType.keep_dims(chunk[key])

    def reshape(self, data):
        return data

    def __eq__(self, other):
        """Structural equality (the reference relies on object identity)."""
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash(type(self).__name__)


class ScalarType(QType):
    def __init__(self, qtype=float):
        self._qtype = qtype

    def base_qtype(self):
        if isinstance(self._qtype, BoolType):
            return self._qtype.base_qtype()
        return self

    def size(self) -> int:
        if hasattr(self._qtype, "size"):
            return self._qtype.size()
        return 1

    def replace_scalar(self, substitute_qtype):
        return substitute_qtype


class BoolType(ScalarType):
    pass


class ArrayType(QType):
    def __init__(self, shape, qtype: QType):
        if isinstance(shape, (int, np.integer)):
            shape = (int(shape),)
        self._shape = tuple(int(s) for s in shape)
        self._qtype = qtype

    def size(self) -> int:
        return int(np.prod(self._shape) * self._qtype.size())

    def get_key(self, key):
        """ArrayType indexing; returns (new QType, start offset=0)."""
        new_shape = np.empty(self._shape)[key].shape
        if len(new_shape) == 1 and new_shape[0] == 1:
            new_shape = ()
        if len(new_shape) > 0:
            q_type = ArrayType(new_shape, qtype=self._qtype)
        else:
            q_type = self._qtype
        return q_type, 0

    def _make_getitem_op(self, chunk, key):
        assert self._shape is not None
        chunk = chunk.reshape((*self._shape, chunk.shape[-2], chunk.shape[-1]))
        return QType.keep_dims(chunk[key])

    def reshape(self, data):
        if isinstance(self._qtype, ScalarType):
            return data.reshape(self._shape)
        return data.reshape((*self._shape, int(np.prod(data.shape)) // int(np.prod(self._shape))))


class TimeSeriesType(QType):
    def __init__(self, times, qtype):
        if isinstance(times, np.ndarray):
            times = times.tolist()
        self._times = list(times)
        self._qtype = qtype

    def size(self) -> int:
        return len(self._times) * self._qtype.size()

    def get_key(self, key):
        q_type = self._qtype
        position = self._times.index(key)
        return q_type, position * q_type.size()

    @staticmethod
    def time_interpolation(quantity, value):
        """Linear interpolation between stored time slices (device-side).

        Replaces scipy.interpolate.interp1d (reference quantity_types.py:161-174)
        with a traceable gather + lerp along the time axis.
        """
        times = np.asarray(quantity.qtype._times, dtype=float)
        inner_size = quantity.qtype._qtype.size()
        n_times = len(times)

        # host-side: find bracketing indices and weight (value is a scalar)
        idx = int(np.clip(np.searchsorted(times, value) - 1, 0, max(n_times - 2, 0)))
        if n_times == 1:
            w = 0.0
        else:
            t0, t1 = times[idx], times[idx + 1]
            w = float((value - t0) / (t1 - t0))

        def interp(y):
            # y: [n_times * inner_size, N, 2]
            y = y.reshape((n_times, inner_size) + y.shape[-2:])
            if n_times == 1:
                return y[0]
            return (1.0 - w) * y[idx] + w * y[idx + 1]

        import mlmc_tpu.quantity.quantity as q_mod
        return q_mod.Quantity(
            quantity_type=quantity.qtype._qtype, input_quantities=[quantity], operation=interp
        )


class FieldType(QType):
    def __init__(self, args: List[Tuple[str, QType]]):
        self._dict = dict(args)
        self._qtype = args[0][1]
        assert all(q_type.size() == self._qtype.size() for _, q_type in args)

    def size(self) -> int:
        return len(self._dict.keys()) * self._qtype.size()

    def get_key(self, key):
        q_type = self._qtype
        position = list(self._dict.keys()).index(key)
        return q_type, position * q_type.size()


class DictType(QType):
    def __init__(self, args: List[Tuple[str, QType]]):
        self._dict = dict(args)  # ordered
        self._check_base_type()

    def _check_base_type(self):
        qtypes = list(self._dict.values())
        qtype_0_base_type = qtypes[0].base_qtype()
        for qtype in qtypes[1:]:
            if not isinstance(qtype.base_qtype(), type(qtype_0_base_type)):
                raise TypeError(
                    "qtype {} has base QType {}, expecting {}. All QTypes must have the same "
                    "base QType, either ScalarType or BoolType".format(
                        qtype, qtype.base_qtype(), qtype_0_base_type
                    )
                )

    def base_qtype(self):
        return next(iter(self._dict.values())).base_qtype()

    def size(self) -> int:
        return int(sum(q_type.size() for _, q_type in self._dict.items()))

    def get_qtypes(self):
        return self._dict.values()

    def replace_scalar(self, substitute_qtype):
        dict_items = []
        for key, qtype in self._dict.items():
            dict_items.append((key, qtype.replace_scalar(substitute_qtype)))
        return DictType(dict_items)

    def get_key(self, key):
        q_type = self._dict[key]
        start = 0
        for k, qt in self._dict.items():
            if k == key:
                break
            start += qt.size()
        return q_type, start
