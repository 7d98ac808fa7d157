"""ASR training CLI.

Parity target: reference espnet2/bin/asr_train.py (thin Task.main wrapper).
Usage: python -m espnet_slurp_tpu.bin.asr_train --config conf/train.yaml \
           [--set key=value ...]
"""
from __future__ import annotations

import argparse
import logging

from ..tasks.asr import ASRTask, load_task_config
from ..utils.config import merge_dicts


def parse_overrides(pairs):
    """['a.b=3', 'c=x'] -> nested dict with YAML-parsed values."""
    import yaml
    out = {}
    for pair in pairs or ():
        key, _, value = pair.partition("=")
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(value)
    return out


def get_parser():
    p = argparse.ArgumentParser(description="Train ASR (TPU-native)")
    p.add_argument("--config", type=str, default=None, help="YAML config")
    p.add_argument("--set", nargs="*", metavar="KEY=VALUE", dest="overrides",
                   help="config overrides, e.g. optim.lr=1e-3")
    p.add_argument("--print_config", action="store_true",
                   help="print fully-resolved config and exit")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for a pod slice")
    return p


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s")
    args = get_parser().parse_args(argv)
    cfg = load_task_config(args.config, parse_overrides(args.overrides))
    if args.print_config:
        import sys
        import yaml
        from ..utils.config import to_dict
        yaml.safe_dump(to_dict(cfg), sys.stdout, sort_keys=False)
        return 0
    mesh = None
    if args.multihost:
        from ..parallel.mesh import init_distributed, make_mesh
        init_distributed()
        mesh = make_mesh()
    else:
        import jax
        if len(jax.devices()) > 1:
            from ..parallel.mesh import make_mesh
            mesh = make_mesh()
    ASRTask.train(cfg, mesh=mesh)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
