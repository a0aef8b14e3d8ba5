"""scnerf-tpu: TPU-native self-calibrating neural radiance fields.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
POSTECH-CVLab/SCNeRF (ICCV 2021). See SURVEY.md for the reference map.
"""
__version__ = "0.1.0"
