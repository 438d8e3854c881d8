from aerial_mapper_tpu.google_maps.client import GoogleMapsClient  # noqa: F401
