import sys

from parallelnbody_tpu.cli import main

sys.exit(main())
