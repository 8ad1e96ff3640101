"""Few-shot trainer CLI — flag-compatible with the reference
``src/trainNetwork.py:211-264`` (with its ``store_ture`` typo fixed so
``--sequential_eval`` parses; SURVEY.md §5.1 item 1)."""

from __future__ import annotations

import argparse

from fpsg_tpu.config import add_train_flags, config_from_args
from fpsg_tpu.train.loop import train_network


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_train_flags(parser)
    conf = config_from_args(parser.parse_args(argv))
    train_network(conf)


if __name__ == "__main__":
    main()
