from ufm_tpu.runtime.batcher import NativeBatcher, ServingRuntime, build_native_library
from ufm_tpu.runtime.export import ExportedUFM, export_model, load_exported

__all__ = [
    "NativeBatcher",
    "ServingRuntime",
    "build_native_library",
    "ExportedUFM",
    "export_model",
    "load_exported",
]
