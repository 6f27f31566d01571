from ufm_tpu.runtime.batcher import NativeBatcher, ServingRuntime, build_native_library

__all__ = ["NativeBatcher", "ServingRuntime", "build_native_library"]
