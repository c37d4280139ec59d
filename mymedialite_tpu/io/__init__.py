from mymedialite_tpu.io.model_io import (  # noqa: F401
    ModelReader, ModelWriter, peek_model_name,
)
