"""Evaluator CLI (reference ``src/evaluate_Network.py:128-181``): loads a
saved model and prints per-class CD + Sinkhorn-EMD means over the test set
(``--sequential_eval`` for the deterministic full pass)."""

from __future__ import annotations

import argparse

from fpsg_tpu.config import add_train_flags, config_from_args
from fpsg_tpu.train.loop import evaluate_network


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_train_flags(parser)  # superset of the evaluator flags
    conf = config_from_args(parser.parse_args(argv))
    evaluate_network(conf)


if __name__ == "__main__":
    main()
