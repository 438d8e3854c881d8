from aerial_mapper_tpu.synth.scene import (  # noqa: F401
    SyntheticScene,
    make_survey_poses,
    render_image,
)
