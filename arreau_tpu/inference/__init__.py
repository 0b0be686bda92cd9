from arreau_tpu.inference.io import SampleResult, load_sample_results, save_sample_results  # noqa: F401
