from .encodec import Encodec, EncodecConfig
