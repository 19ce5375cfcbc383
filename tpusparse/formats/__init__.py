from tpusparse.formats.coo import CooMatrix
from tpusparse.formats.csr import CsrMatrix
from tpusparse.formats.bcsr import BcsrMatrix
from tpusparse.formats.tiles import MergeTiles
