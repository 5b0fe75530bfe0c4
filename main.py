#!/usr/bin/env python3
"""CLI: ``python3 main.py <config.yaml>`` (reference main.py:289 UX)."""

import sys

from hplflownet_tpu.utils.config import parse_args_from_yaml
from hplflownet_tpu.train.driver import run


def main():
    if len(sys.argv) != 2:
        print("usage: python3 main.py <config.yaml>", file=sys.stderr)
        sys.exit(2)
    args = parse_args_from_yaml(sys.argv[1])
    run(args)


if __name__ == "__main__":
    main()
