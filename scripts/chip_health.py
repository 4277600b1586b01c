"""One-line TPU health probe for the shared-tunnel chip.

Thin CLI over rat_tpu.cli.chip_health (the probe core moved into the
package in r5 so bench.py can stamp every capture with chip state; see
that module for the three degradation modes and the marginal-cost
measurement method).

Usage: python scripts/chip_health.py  ->  one JSON line.
`healthy` means all modes are absent and benchmark numbers are
representative.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from rat_tpu.cli.chip_health import collect
    print(json.dumps(collect()))


if __name__ == "__main__":
    main()
