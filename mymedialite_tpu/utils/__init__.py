from mymedialite_tpu.utils.params import configure, echo, parse_options  # noqa: F401
