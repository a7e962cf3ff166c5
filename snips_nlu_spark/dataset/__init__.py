from .validation import validate_and_format_dataset  # noqa: F401
from .yaml_loader import dataset_from_yaml  # noqa: F401
