"""CLI driver mirroring the reference's onvort3d executable (onvort3d.cpp).

Usage: python -m onbody_tpu.drivers.onvort3d -n=100000 -t=1.0 -o=4 -b=128
"""

import sys

from onbody_tpu.drivers.common import run_driver

DEFAULTS = None

def main(argv=None):
    run_driver("vort3d", "onvort3d", sys.argv[1:] if argv is None else argv,
               defaults=DEFAULTS)


if __name__ == "__main__":
    main()
