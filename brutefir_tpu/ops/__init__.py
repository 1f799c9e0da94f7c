from . import partconv
