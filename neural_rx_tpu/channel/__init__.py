"""L2 channel simulation (TPU-native replacement for the reference's
Sionna channel stack, SURVEY.md §2.4: TDL / DoubleTDL / UMi / AWGN /
Dataset channels + CFO impairment, applied in the frequency domain)."""

from .apply import apply_ofdm_channel
from .tdl import TDLChannel, TDL_PROFILES, exp_correlation_matrix
from .double_tdl import DoubleTDLChannel
from .cfo import FrequencyOffset
from .tr38901 import UMiUMaChannel
from .dataset import DatasetChannel
