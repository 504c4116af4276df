from julia_raytracer_tpu.utils.timing import format_seconds  # noqa: F401
