"""Compatibility layer: import artifacts from the reference repo
(pickled Keras weight lists, result pickles) for parity checking."""
