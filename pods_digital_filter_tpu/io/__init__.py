from pods_digital_filter_tpu.io import hdf5, plane, prf  # noqa: F401
