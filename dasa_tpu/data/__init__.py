from dasa_tpu.data.datasets import (  # noqa: F401
    load_datasets,
    expand_instructions,
    generate_synthetic_dataset,
)
from dasa_tpu.data.features import FeatureDB, load_feature_db  # noqa: F401
