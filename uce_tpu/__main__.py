"""``python -m uce_tpu`` == the ``uce`` CLI."""

import sys

from uce_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main())
