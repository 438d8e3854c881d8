"""CLI: fetch a Google static-maps satellite tile for a UTM region.

Mirrors ``aerial_mapper_demos_test_google_maps_api``
(main-test-google-maps-api.cc). Requires network egress + API key; without
them it still prints the URL and the geometry transforms.
"""

import argparse

from aerial_mapper_tpu.cli.common import expand_flagfiles
from aerial_mapper_tpu.geo import utm as utm_mod
from aerial_mapper_tpu.google_maps import GoogleMapsClient


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--center_easting", type=float, required=True)
    p.add_argument("--center_northing", type=float, required=True)
    p.add_argument("--utm_zone", type=int, default=32)
    p.add_argument("--zoom", type=int, default=18)
    p.add_argument("--size", type=int, nargs=2, default=(640, 640))
    p.add_argument("--api_key", default="")
    p.add_argument("--output", default="/tmp/google_maps_tile.png")
    import sys

    args = p.parse_args(expand_flagfiles(sys.argv[1:] if argv is None
                                         else argv))

    lat, lon = utm_mod.utm_to_ll(args.center_easting, args.center_northing,
                                 args.utm_zone)
    client = GoogleMapsClient(
        float(lat), float(lon), zoom=args.zoom,
        width_px=args.size[0], height_px=args.size[1], api_key=args.api_key,
    )
    print("tile URL:", client.tile_url())
    print("meters/pixel:", client.meters_per_pixel)
    tile = client.fetch_tile()
    if tile is None:
        print("fetch failed (no egress or key) — URL printed above")
        return
    from aerial_mapper_tpu.io.images import save_image

    save_image(args.output, tile)
    print("saved", args.output)


if __name__ == "__main__":
    main()
