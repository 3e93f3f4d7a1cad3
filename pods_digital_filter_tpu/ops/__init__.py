from pods_digital_filter_tpu.ops import filters, fourier, lund, pod, rotation, signal  # noqa: F401
