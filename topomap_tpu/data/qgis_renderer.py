"""QGIS map-tile rendering — the data-creation front end (gated on PyQGIS).

Mirrors ``PromptEngineering/empty_prompt_data_creation.py``: render random 512×512
source/target tile pairs from Swiss vector layers (``DKM25_*``) at scale 1:5000 via the
QGIS rendering engine, emitting ``pairs.jsonl`` with empty prompts. QGIS is a desktop GIS
dependency that cannot ship in a TPU pod image, so:

* when ``qgis.core`` imports, :func:`render_pairs` drives a real QGIS project;
* otherwise the module still exposes the same config surface and raises a clear error —
  and the self-contained path is :mod:`topomap_tpu.data.synthetic`, which generates
  structurally equivalent tiles in the exact class palette.
"""
from __future__ import annotations

import dataclasses
import random
from pathlib import Path

from topomap_tpu.data.pairs import PairsRecord, write_pairs_jsonl


@dataclasses.dataclass(frozen=True)
class QGISRenderConfig:
    """Config surface of the reference script (``empty_prompt_data_creation.py:18-47``)."""

    project_path: str = ""
    source_layers: tuple[str, ...] = ()  # seg-style styled layer names
    target_layers: tuple[str, ...] = ()  # raster-style styled layer names
    tile_px: int = 512
    scale: float = 5000.0  # 1:5000
    n_tiles: int = 100
    seed: int = 42
    extent_margin: float = 0.05  # stay away from layer bounds


def qgis_available() -> bool:
    try:
        import qgis.core  # noqa: F401

        return True
    except Exception:
        return False


def render_pairs(cfg: QGISRenderConfig, out_dir: str | Path) -> list[PairsRecord]:
    """Render ``n_tiles`` random source/target pairs with empty prompts."""
    if not qgis_available():
        raise RuntimeError(
            "PyQGIS is not available in this environment. Use "
            "topomap_tpu.data.synthetic.generate_pairs_dataset for self-contained tiles, "
            "or run this module inside a QGIS python environment."
        )
    from qgis.core import (  # type: ignore
        QgsApplication,
        QgsMapRendererParallelJob,
        QgsMapSettings,
        QgsProject,
        QgsRectangle,
    )
    from qgis.PyQt.QtCore import QSize  # type: ignore
    from qgis.PyQt.QtGui import QColor  # type: ignore

    out_dir = Path(out_dir)
    (out_dir / "source").mkdir(parents=True, exist_ok=True)
    (out_dir / "target").mkdir(parents=True, exist_ok=True)

    app = QgsApplication([], False)
    app.initQgis()
    project = QgsProject.instance()
    project.read(cfg.project_path)
    layers = {l.name(): l for l in project.mapLayers().values()}

    def render(layer_names, center_x, center_y, path):
        settings = QgsMapSettings()
        settings.setLayers([layers[n] for n in layer_names if n in layers])
        settings.setBackgroundColor(QColor(255, 255, 255))
        settings.setOutputSize(QSize(cfg.tile_px, cfg.tile_px))
        # ground extent for tile_px pixels at 1:scale with 96 dpi
        ground = cfg.tile_px * cfg.scale * 0.0254 / 96.0
        settings.setExtent(
            QgsRectangle(
                center_x - ground / 2, center_y - ground / 2,
                center_x + ground / 2, center_y + ground / 2,
            )
        )
        job = QgsMapRendererParallelJob(settings)
        job.start()
        job.waitForFinished()
        job.renderedImage().save(str(path))

    first = layers[cfg.source_layers[0]]
    ext = first.extent()
    mx = ext.width() * cfg.extent_margin
    my = ext.height() * cfg.extent_margin
    rng = random.Random(cfg.seed)
    records = []
    for i in range(cfg.n_tiles):
        cx = rng.uniform(ext.xMinimum() + mx, ext.xMaximum() - mx)
        cy = rng.uniform(ext.yMinimum() + my, ext.yMaximum() - my)
        sp = out_dir / "source" / f"tile{i:05d}.png"
        tp = out_dir / "target" / f"tile{i:05d}.png"
        render(cfg.source_layers, cx, cy, sp)
        render(cfg.target_layers, cx, cy, tp)
        records.append(PairsRecord(prompt="", source=str(sp), target=str(tp)))
    write_pairs_jsonl(out_dir / "pairs.jsonl", records)
    app.exitQgis()
    return records
