"""``python -m nns_tpu`` runs the benchmark harness (the ./main analog)."""

import sys

from nns_tpu.harness import main

sys.exit(main())
