"""L3+L5: configuration assembly, end-to-end system model, training loop,
Monte-Carlo BLER evaluation (TPU-native re-design of reference
utils/parameters.py, utils/e2e_model.py, utils/utils.py, scripts/)."""
