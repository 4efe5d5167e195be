"""Several aspect-ratio variants in ONE fused device pass.

ComposeService.render_batch compiles (and caches) a single program that
solves the layout, synthesizes each variant's background, and runs the
fused resize+alpha-over kernel for every requested ratio at once — the
throughput path behind the /v1/render_batch endpoint.
"""
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(REPO))

from image_transformation_tpu.core.cache import honor_platform_env

honor_platform_env()

from image_transformation_tpu.serving import ComposeService


def main() -> None:
    service = ComposeService(REPO / "data")
    renders = service.render_batch("squarespace", ["9:16", "1:1", "16:9"])
    from PIL import Image

    for ratio, (canvas_size, boxes, img) in renders.items():
        path = f"/tmp/example_batch_{ratio.replace(':', 'x')}.png"
        Image.fromarray(img, "RGBA").save(path)
        print(f"{ratio}: {canvas_size[0]}x{canvas_size[1]}, "
              f"{len(boxes)} boxes -> {path}")


if __name__ == "__main__":
    main()
