#!/usr/bin/env python
"""Convenience wrapper: python run_expid.py --config DIR --expid ID
(reference CLI shape: run_expid.py:27-41)."""

from rat_tpu.cli.run_expid import main

if __name__ == "__main__":
    main()
