"""Experiment configuration: INI parsing + system assembly.

Replaces the reference `utils/parameters.py` with the same config schema
(19 experiment files, same labels/keys) but SAFE parsing
(`ast.literal_eval`, not `eval()` — reference anti-goal SURVEY.md §7.4)
and first-party system construction: PUSCH configs per (MCS, UE),
transmitters, channel model, CFO impairment.

Training-vs-eval value pairs: `X_eval` keys override `X` when
training=False (reference parameters.py:118-127).
"""

from __future__ import annotations

import ast
import configparser
import os

import numpy as np
import jax.numpy as jnp

from ..phy.nr.dmrs import DMRSConfig
from ..phy.nr.pusch import CarrierConfig, PUSCHConfig
from ..phy.nr.transmitter import PUSCHTransmitter
from ..channel.tdl import TDLChannel
from ..channel.double_tdl import DoubleTDLChannel
from ..channel.cfo import FrequencyOffset

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

_EVAL_OVERRIDES = ["channel_type", "n_size_bwp", "max_ut_velocity",
                   "min_ut_velocity", "channel_norm", "cfo_offset_ppm",
                   "tfrecord_filename", "random_subsampling"]

_DTYPES = {"float32": jnp.float32, "float16": jnp.float16,
           "bfloat16": jnp.bfloat16,
           # tolerate reference-style tokens
           "torch.float32": jnp.float32, "tf.float32": jnp.float32,
           "torch.float16": jnp.float16}


def _parse_value(raw: str):
    raw = raw.strip()
    if raw in _DTYPES:
        return _DTYPES[raw]
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        return raw  # bare string


class Parameters:
    """Parsed + assembled system configuration.

    system: 'nrx', 'baseline_*', or 'dummy' (parse only).
    """

    def __init__(self, config_name: str, system: str = "nrx",
                 training: bool = False, num_tx_eval: int | None = None,
                 config_dir: str | None = None,
                 overrides: dict | None = None):
        if not config_name.endswith(".cfg"):
            config_name += ".cfg"
        path = os.path.join(config_dir or CONFIG_DIR, config_name)
        cp = configparser.ConfigParser(inline_comment_prefixes=("#",))
        with open(path) as f:
            cp.read_string(f.read())

        self.system = system
        self.training = training
        self.config_str = ""
        for section in cp.sections():
            for key, raw in cp[section].items():
                setattr(self, key, _parse_value(raw))
                self.config_str += f"{key} = {raw}\n\n"

        # eval-mode overrides
        if not training:
            for name in _EVAL_OVERRIDES:
                ev = name + "_eval"
                if hasattr(self, ev):
                    setattr(self, name, getattr(self, ev))

        # attributes with defaults that configs normally omit (must be
        # set BEFORE override validation so they are overridable)
        self.cir_max_records = -1  # DatasetChannel size cap (site sweep)

        # caller overrides (applied before any component is built), e.g.
        # channel_type for the reference's 1-UE-on-TDL eval slices
        # (reference nrx_rt config comments / evaluate.py:174-180)
        for key, value in (overrides or {}).items():
            if not hasattr(self, key):
                raise KeyError(f"unknown Parameters override: {key}")
            setattr(self, key, value)

        if not hasattr(self, "mcs_var_mcs_masking"):
            self.mcs_var_mcs_masking = False
        if not hasattr(self, "random_subsampling"):
            self.random_subsampling = True
        if not hasattr(self, "xla"):
            self.xla = True

        if self.system == "dummy":
            return

        # ---------------- PUSCH configs (per MCS, per UE) ---------------
        carrier = CarrierConfig(
            n_cell_id=self.n_cell_id, cyclic_prefix=self.cyclic_prefix,
            subcarrier_spacing=float(self.subcarrier_spacing),
            n_size_grid=self.n_size_bwp, n_start_grid=self.n_start_grid,
            slot_number=self.slot_number, frame_number=self.frame_number,
            carrier_frequency=float(self.carrier_frequency))
        self.carrier = carrier

        assert self.num_nrx_iter_eval <= self.num_nrx_iter, \
            "num_nrx_iter_eval must be <= num_nrx_iter"

        if not training:
            if num_tx_eval is None:
                num_tx_eval = len(self.dmrs_port_sets)
            self.max_num_tx = num_tx_eval
            self.min_num_tx = num_tx_eval
        port_sets = self.dmrs_port_sets[:self.max_num_tx]

        self.pusch_configs = []  # [mcs][ue]
        for mcs in self.mcs_index:
            per_ue = []
            for ue, ports in enumerate(port_sets):
                dmrs = DMRSConfig(
                    config_type=self.dmrs_config_type,
                    type_a_position=self.dmrs_type_a_position,
                    additional_position=self.dmrs_additional_position,
                    length=self.dmrs_length,
                    dmrs_port_set=tuple(ports), n_scid=self.n_scid,
                    num_cdm_groups_without_data=(
                        self.num_cdm_groups_without_data),
                    n_id=tuple(self.dmrs_nid[ue]),
                    mapping_type=self.dmrs_mapping_type)
                per_ue.append(PUSCHConfig(
                    carrier, dmrs, mcs_index=mcs, mcs_table=self.mcs_table,
                    num_antenna_ports=self.num_antenna_ports,
                    precoding=self.precoding, tpmi=self.tpmi,
                    symbol_allocation=tuple(self.symbol_allocation),
                    n_rnti=self.n_rntis[ue], n_id=self.n_ids[ue],
                    num_bp_iter=self.num_bp_iter, cn_type=self.cn_type))
            self.pusch_configs.append(per_ue)

        # ---------------- Transmitters (one per MCS) --------------------
        self.transmitters = [
            PUSCHTransmitter(per_ue,
                             trainable_constellation=self.custom_constellation)
            for per_ue in self.pusch_configs]
        rg = self.transmitters[0].resource_grid

        # ---------------- Channel ---------------------------------------
        ct = self.channel_type
        pc = self.pusch_configs[0][0]
        if ct == "TDL-B100":
            self.channel_model = TDLChannel(
                "B", 100e-9, carrier.carrier_frequency,
                min_speed=self.min_ut_velocity,
                max_speed=self.max_ut_velocity,
                num_rx_ant=self.num_rx_antennas,
                num_tx_ant=pc.num_antenna_ports,
                normalize=self.channel_norm)
            self.channel_num_tx = 1
        elif ct == "TDL-C300":
            self.channel_model = TDLChannel(
                "C", 300e-9, carrier.carrier_frequency,
                min_speed=self.min_ut_velocity,
                max_speed=self.max_ut_velocity,
                num_rx_ant=self.num_rx_antennas,
                num_tx_ant=pc.num_antenna_ports,
                normalize=self.channel_norm)
            self.channel_num_tx = 1
        elif ct.startswith("DoubleTDL"):
            corr = ct[len("DoubleTDL"):]
            self.channel_model = DoubleTDLChannel(
                carrier.carrier_frequency,
                num_rx_ant=self.num_rx_antennas,
                num_tx_ant=pc.num_antenna_ports,
                norm_channel=self.channel_norm, correlation=corr)
            self.channel_num_tx = 2
        elif ct in ("UMi", "UMa"):
            from ..channel.tr38901 import UMiUMaChannel
            self.channel_model = UMiUMaChannel(
                scenario=ct.lower(),
                carrier_frequency=carrier.carrier_frequency,
                num_rx_ant=self.num_rx_antennas,
                num_tx_ant=pc.num_antenna_ports,
                min_speed=self.min_ut_velocity,
                max_speed=self.max_ut_velocity,
                normalize=self.channel_norm)
            self.channel_num_tx = None  # any
        elif ct == "AWGN":
            self.channel_model = None
            self.channel_num_tx = None
        elif ct == "Dataset":
            from ..channel.dataset import DatasetChannel
            self.channel_model = DatasetChannel(
                os.path.join("data", self.tfrecord_filename),
                training=training, num_tx=self.max_num_tx,
                random_subsampling=self.random_subsampling,
                num_rx_ant=self.num_rx_antennas,
                num_tx_ant=pc.num_antenna_ports,
                # dataset-size axis of the site fine-tune sweep
                # (reference nrx_site_specific_sweep_results keys);
                # set via Parameters(overrides={"cir_max_records": N})
                max_num_examples=getattr(self, "cir_max_records", -1))
            self.channel_num_tx = None
        else:
            raise ValueError(f"Unknown channel type {ct}")
        self.channel_type_name = ct

        # ---------------- CFO impairment --------------------------------
        if self.cfo_offset_ppm > 0:
            offset = carrier.carrier_frequency / 1e6 * self.cfo_offset_ppm
            bandwidth = rg.num_subcarriers * carrier.subcarrier_spacing
            self.frequency_offset = FrequencyOffset(
                offset / bandwidth, cp_length=0,
                constant_offset=(not training))
        else:
            self.frequency_offset = None
