from .descript.dac import DAC
from .encodec.encodec import Encodec, EncodecConfig
from .snac.snac import SNAC
from .vocos.vocos import Vocos
from .mimi.mimi import Mimi, MimiStreamingDecoder
