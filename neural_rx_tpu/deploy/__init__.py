"""L6 deployment: Aerial-compatible planar-tensor receiver ABI and
AOT-compiled fixed-shape executables per PRB bucket (replaces the
reference's ONNX -> TensorRT export path, SURVEY.md §2.10)."""
