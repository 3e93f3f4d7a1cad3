"""numpy_support shim for the vtk stub (see vtk/__init__.py)."""

import numpy as np

from vtk import _VtkDataArray


def numpy_to_vtk(arr, deep=0):
    return _VtkDataArray(np.array(arr) if deep else np.asarray(arr))


def vtk_to_numpy(obj):
    if isinstance(obj, np.ndarray):
        return obj
    return np.asarray(obj._arr)
