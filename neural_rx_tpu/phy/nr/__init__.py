"""5G NR transport chain and PUSCH specifics (first-party, TPU-native).

Replaces the reference's external Sionna dependency (SURVEY.md §2.9):
TB encoder/decoder (CRC + LDPC + rate matching + scrambling), DMRS
generation, PUSCH configuration and transmitter, codebook precoding.
"""
