from .loader import DataLoader, build_dataloader  # noqa: F401
from .transforms import make_transforms  # noqa: F401
