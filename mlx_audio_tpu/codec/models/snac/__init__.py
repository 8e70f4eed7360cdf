from .snac import SNAC
