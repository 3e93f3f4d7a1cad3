from pods_digital_filter_tpu.models import profiles  # noqa: F401
