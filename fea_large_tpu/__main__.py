import sys

from fea_large_tpu.cli import main

sys.exit(main())
