"""Training CLI (counterpart of reference `python -m gluefactory.train`,
train.py:642-700):

    python -m gluefactory_tpu.train <experiment> --conf conf.yaml k.v=x ...

Precedence: yaml conf < CLI dotlist (reference :675-677); --restore resumes
from the last checkpoint of the experiment.
"""

import argparse
from pathlib import Path

from ..settings import TRAINING_PATH
from ..utils.config import load_yaml, merge, parse_dotlist
from .trainer import Trainer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment")
    parser.add_argument("--conf", type=str, default=None)
    parser.add_argument("--restore", action="store_true")
    parser.add_argument("--overfit", action="store_true")
    parser.add_argument("--profile", action="store_true")
    # multi-host: jax.distributed over DCN replaces the reference's
    # torch.multiprocessing.spawn + NCCL (train.py:691-698)
    parser.add_argument("--distributed", action="store_true")
    # jax_debug_nans replaces torch.autograd.set_detect_anomaly (train.py:314)
    parser.add_argument("--detect_anomaly", action="store_true")
    # run the config's `benchmarks:` overlays at the end of every epoch
    # (reference --run_benchmarks, train.py:376-393)
    parser.add_argument("--run_benchmarks", action="store_true")
    parser.add_argument("dotlist", nargs="*")
    args = parser.parse_args()

    if args.distributed:
        from ..parallel.distributed import init_distributed

        init_distributed()
    if args.detect_anomaly:
        import jax

        jax.config.update("jax_debug_nans", True)

    conf = {}
    if args.conf:
        path = Path(args.conf)
        if not path.exists():
            path = Path(__file__).parent.parent / "configs" / args.conf
        conf = load_yaml(path)
    conf = merge(conf, parse_dotlist(args.dotlist))
    if args.run_benchmarks and conf.get("benchmarks"):
        conf = merge(conf, {"train": {"benchmarks": conf["benchmarks"]}})
    if args.overfit:
        conf = merge(conf, {"train": {"overfit": True}})
    if args.profile:
        conf = merge(conf, {"train": {"profile": True}})

    output_dir = Path(TRAINING_PATH) / args.experiment
    trainer = Trainer(conf, args.experiment, output_dir)
    trainer.build(restore=args.restore)
    trainer.train()


if __name__ == "__main__":
    main()
