"""Debug visualizers for fields and decoder internals.

Reference parity: ``src/openpifpaf/visualizer/`` — a registry of "wanted"
field indices selected via ``--debug-indices``; each visualizer renders a
specific field type (CIF/CAF/CifDet targets and predictions, CifHr
accumulators, seeds, occupancy) as matplotlib figures.
"""

from .base import Base
from .caf import Caf
from .cif import Cif
from .cifdet import CifDet
from .cifhr import CifHr
from .occupancy import Occupancy
from .seeds import Seeds
from .tcaf import Tcaf

__all__ = ['Base', 'Caf', 'Cif', 'CifDet', 'CifHr', 'Occupancy', 'Seeds',
           'Tcaf', 'cli', 'configure']


def cli(parser):
    Base.cli(parser)


def configure(args):
    Base.configure(args)
