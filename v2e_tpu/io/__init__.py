"""Event stream sinks and input readers.

Writers produce the same file formats as the reference
(/root/reference/v2ecore/output/): AEDAT-2.0 (jAER), AEDAT-4.0 (dv), RPG
text, and HDF5 event databases.  All writers share the AER input convention
``events[N, 4] = [t_seconds, x, y, p(+1/-1)]``.
"""

from v2e_tpu.io.aedat2 import AEDat2Output
from v2e_tpu.io.text import DVSTextOutput
from v2e_tpu.io.hdf5 import DVSH5Output
from v2e_tpu.io.aedat4 import AEDat4Output

__all__ = ["AEDat2Output", "DVSTextOutput", "DVSH5Output", "AEDat4Output"]
