from ufm_tpu.runtime.batcher import NativeBatcher, ServingRuntime, build_native_library
from ufm_tpu.runtime.export import ExportedUFM, export_model, load_artifact_model, load_exported
from ufm_tpu.runtime.server import UFMServer

__all__ = [
    "NativeBatcher",
    "UFMServer",
    "ServingRuntime",
    "build_native_library",
    "ExportedUFM",
    "export_model",
    "load_artifact_model",
    "load_exported",
]
