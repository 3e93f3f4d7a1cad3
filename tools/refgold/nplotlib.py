"""No-op stand-in for the reference's nplotlib (matplotlib/VTK plotting
wrapper): the golden run needs no figures, and the real module drags in
offscreen-VTK rendering the environment cannot provide.  PEP 562 module
__getattr__ makes every plotting call a silent no-op."""


def _noop(*args, **kwargs):
    return None


def __getattr__(name):
    return _noop
