from .evaluators import (  # noqa: F401
    STDetectionEvaluaterAVA,
    STDetectionEvaluaterJHMDB,
    STDetectionEvaluaterUCF,
    read_labelmap,
)
from .pascal_map import PascalMAPEvaluator  # noqa: F401
from .video_map import VideoMAPEvaluator  # noqa: F401
