"""Live preview HTTP server for incremental mapping runs.

The reference streams the growing map to rviz while mapping
(``aerial-mapper-grid-map.cc:51-64`` publishes the grid map in a 0.1 Hz
endless loop; ``ortho-forward-homography.cc:210-228`` publishes the mosaic
per update). The framework's incremental CLI dumps preview artifacts into
``--preview_dir`` every K updates; this module completes the replacement by
SERVING them: a stdlib ``ThreadingHTTPServer`` on a daemon thread with an
auto-refreshing HTML page, so a browser pointed at the mapping machine
shows the mosaic growing live — no ROS, no extra dependencies.

Only basenames inside the preview directory are served (no traversal); the
image responses are marked uncacheable and the page re-fetches them with a
cache-busting query every ``refresh_seconds``.
"""

from __future__ import annotations

import html
import http.server
import logging
import os
import threading

logger = logging.getLogger("aerial_mapper_tpu")

_PAGE = """<!DOCTYPE html>
<html><head><title>aerial_mapper_tpu live preview</title>
<style>
 body {{ background: #111; color: #ddd; font-family: sans-serif;
        margin: 1.5em; }}
 img {{ image-rendering: pixelated; max-width: 46vw; max-height: 80vh;
       border: 1px solid #444; }}
 .row {{ display: flex; gap: 1em; }}
 figcaption {{ margin-top: 0.3em; color: #999; }}
</style></head>
<body>
<h2>aerial_mapper_tpu &mdash; live mapping preview</h2>
<p>serving <code>{preview_dir}</code>; refreshes every
{refresh_seconds:.1f} s (the reference's rviz loop analogue,
aerial-mapper-grid-map.cc:51-64)</p>
<div class="row">
 <figure><img id="ortho" src="ortho_live.png">
  <figcaption>orthomosaic (ortho_live.png)</figcaption></figure>
 <figure><img id="elev" src="elevation_live.png">
  <figcaption>elevation / DSM (elevation_live.png)</figcaption></figure>
 <figure><img id="cloud" src="cloud_live.png"
          onerror="this.style.display='none'"
          onload="this.style.display=''">
  <figcaption>growing point cloud, top-down
   (cloud_live.png; raw decimated points: cloud_live.npz)</figcaption>
 </figure>
</div>
<script>
 setInterval(function () {{
   var t = Date.now();
   ["ortho", "elev", "cloud"].forEach(function (id) {{
     var el = document.getElementById(id);
     el.src = el.src.split("?")[0] + "?" + t;
   }});
 }}, {refresh_ms});
</script>
</body></html>
"""


class _PreviewHandler(http.server.BaseHTTPRequestHandler):
    preview_dir = "."
    refresh_seconds = 2.0

    def do_GET(self):  # noqa: N802 (BaseHTTPRequestHandler API)
        path = self.path.split("?", 1)[0]
        if path in ("/", "/index.html"):
            body = _PAGE.format(
                preview_dir=html.escape(self.preview_dir),
                refresh_seconds=self.refresh_seconds,
                refresh_ms=int(self.refresh_seconds * 1000),
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        # serve ONLY plain basenames from the preview directory
        name = path.lstrip("/")
        if (not name or "/" in name or "\\" in name or name.startswith(".")
                or name != os.path.basename(name)):
            self.send_error(404)
            return
        full = os.path.join(self.preview_dir, name)
        if not os.path.isfile(full):
            self.send_error(404)
            return
        ctype = {
            ".png": "image/png", ".jpg": "image/jpeg",
            ".jpeg": "image/jpeg", ".npz": "application/octet-stream",
        }.get(os.path.splitext(name)[1].lower(), "application/octet-stream")
        with open(full, "rb") as f:
            data = f.read()
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.send_header("Cache-Control", "no-store")
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, fmt, *args):  # quiet: one line per refresh x2
        logger.debug("preview http: " + fmt, *args)


def start_preview_server(preview_dir: str, port: int = 8099,
                         refresh_seconds: float = 2.0):
    """Serve ``preview_dir`` on ``port`` (0 = ephemeral) from a daemon
    thread; returns the server (its ``.server_address[1]`` is the bound
    port; stop with :func:`stop_preview_server`)."""
    os.makedirs(preview_dir, exist_ok=True)
    handler = type(
        "PreviewHandler", (_PreviewHandler,),
        {"preview_dir": preview_dir, "refresh_seconds": refresh_seconds},
    )
    server = http.server.ThreadingHTTPServer(("", port), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    logger.info("live preview at http://localhost:%d/ (serving %s)",
                server.server_address[1], preview_dir)
    return server


def stop_preview_server(server) -> None:
    """Stop serving AND close the listening socket — ``shutdown()`` alone
    leaves the bound fd open until GC, so a restart on the same port
    would fail with EADDRINUSE."""
    server.shutdown()
    server.server_close()
