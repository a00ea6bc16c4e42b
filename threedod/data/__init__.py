from .batch import Batch, GroundTruth, collate
from .build import (
    TestLoader,
    TrainLoader,
    get_dataset_dicts,
    repeat_factors_from_category_frequency,
)
from .builtin import get_omni3d_categories
from .mapper import DatasetMapper3D
from .omni3d import (
    CATALOG,
    Omni3D,
    get_filter_settings_from_cfg,
    is_ignore,
    load_omni3d_json,
    register_and_store_model_metadata,
    simple_register,
)
from .priors import compute_priors
from .synth import SYNTH_CATEGORIES, generate_synth_dataset
