from arreau_tpu.models.ponita import PonitaFiberBundle, PonitaConfig, FiberBundleInputs  # noqa: F401
