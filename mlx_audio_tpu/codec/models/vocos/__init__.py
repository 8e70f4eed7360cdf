from .vocos import Vocos, VocosBackbone, ISTFTHead, MelSpectrogramFeatures
