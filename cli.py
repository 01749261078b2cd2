#!/usr/bin/env python
"""Repo-root launcher, same surface as the reference's ``cli.py``:
``python cli.py --config <yaml> --override key=value ...``"""

import sys

from zdcsim.cli import main

if __name__ == "__main__":
    sys.exit(main())
