"""Validate the shipped named configs (counterpart of the reference's
gluefactory/configs/ inventory): every YAML parses, every referenced model /
dataset name resolves in the registries, and every reference config stem has
a counterpart here."""

from pathlib import Path

import pytest
import yaml

from gluefactory_tpu.datasets import get_dataset
from gluefactory_tpu.models import get_model

CONFIG_DIR = Path(__file__).parent.parent / "gluefactory_tpu" / "configs"
CONFIGS = sorted(CONFIG_DIR.glob("*.yaml"))

# stems of the reference's gluefactory/configs/*.yaml (SURVEY.md §2.1)
REFERENCE_STEMS = [
    "aliked+NN",
    "aliked+lightglue-official",
    "aliked+lightglue_homography",
    "aliked+lightglue_megadepth",
    "disk+NN",
    "disk+lightglue-official",
    "disk+lightglue_homography",
    "disk+lightglue_megadepth",
    "sift+NN",
    "sift+lightglue-official",
    "sift+lightglue_homography",
    "sift+lightglue_megadepth",
    "superpoint+NN",
    "superpoint+lightglue-MINE",
    "superpoint+lightglue-official",
    "superpoint+lightglue_MP",
    "superpoint+lightglue_homography",
    "superpoint+lightglue_megadepth",
    "superpoint+lsd+gluestick-homography",
    "superpoint+lsd+gluestick-megadepth",
    "superpoint+lsd+gluestick",
    "superpoint+superglue-official",
    "superpoint-open+NN",
    "superpoint-open+lightglue_MP",
    "superpoint-open+lightglue_homography",
    "superpoint-open+lightglue_megadepth",
]


def _model_names(conf: dict):
    """Yield every model name referenced by a (possibly nested) model conf."""
    name = conf.get("name")
    if name:
        yield name
    for key in ("extractor", "matcher", "filter", "solver", "ground_truth",
                "point_extractor", "line_extractor", "detector", "descriptor"):
        sub = conf.get(key)
        if isinstance(sub, dict):
            yield from _model_names(sub)


def test_reference_inventory_covered():
    stems = {p.stem for p in CONFIGS}
    missing = [s for s in REFERENCE_STEMS if s not in stems]
    assert not missing, f"reference configs without counterpart: {missing}"


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.stem)
def test_config_resolves(path):
    conf = yaml.safe_load(path.read_text())
    assert isinstance(conf, dict) and conf
    if "model" in conf:
        for name in _model_names(conf["model"]):
            assert get_model(name) is not None, name
    if "data" in conf:
        assert get_dataset(conf["data"]["name"]) is not None
    for bench in conf.get("benchmarks", {}).values():
        model = bench.get("model") if isinstance(bench, dict) else None
        if isinstance(model, dict):
            for name in _model_names(model):
                assert get_model(name) is not None, name
