from aerial_mapper_tpu.utils.timing import StageTimer, block_until_ready_tree  # noqa: F401
from aerial_mapper_tpu.utils.palettes import get_palette, apply_palette  # noqa: F401
