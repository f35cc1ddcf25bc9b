import sys

from radiodsp_sdr_rx_tpu.cli import main

sys.exit(main())
