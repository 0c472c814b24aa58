from .costs import ANNOTATION_COSTS
from .paths import DataPaths
from .seeding import seed_everything

__all__ = ["ANNOTATION_COSTS", "DataPaths", "seed_everything"]
