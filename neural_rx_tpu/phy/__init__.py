"""L1 PHY primitive library (TPU-native replacement for the vendored
Sionna subset catalogued in SURVEY.md §2.9 / reference utils/siona_tf.py)."""

from .constellation import pam_gray_bits, qam_points, Constellation
from .mapping import map_bits, demap_maxlog, demap_app
from .ofdm import ofdm_modulate, ofdm_demodulate
from .misc import ebnodb2no, complex_awgn
