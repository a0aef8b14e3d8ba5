from scnerf_tpu.core.pytree import pytree_dataclass, static_field
from scnerf_tpu.core.config import (
    ExperimentConfig, experiment_from_flags, load_experiment, parse_config_file,
)
from scnerf_tpu.core.rng import fix_seeds, device_key, step_key
from scnerf_tpu.core.imaging import to8b, colorize_depth
