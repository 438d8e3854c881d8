from aerial_mapper_tpu.ortho.backward_grid import backward_grid_update  # noqa: F401
from aerial_mapper_tpu.ortho.homography import (  # noqa: F401
    homography_mosaic_batch,
    homography_mosaic_update,
)
from aerial_mapper_tpu.ortho.from_points import ortho_from_points  # noqa: F401


def __getattr__(name):
    # lazy: the Pallas kernel is opt-in and must not drag
    # jax.experimental.pallas into every `import aerial_mapper_tpu.ortho`
    if name == "score_pass_pallas":
        from aerial_mapper_tpu.ortho.pallas_score import score_pass_pallas
        return score_pass_pallas
    raise AttributeError(name)
