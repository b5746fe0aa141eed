from .parse import RawGesture, parse_log_file
from .pipeline import (
    GestureArrays,
    GestureDataset,
    create_train_test_split,
    load_dataset_from_zip,
)
from .preprocess import (
    apply_canonical_transform,
    compute_canonical_transform,
    infer_key_positions,
    normalize_gesture,
)
from .synthetic import write_synthetic_swipelogs_zip
