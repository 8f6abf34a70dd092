"""Periodic table (reference: src/general/elements.{cpp,h})."""

SYMBOLS = [
    "", "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne",
    "Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar", "K", "Ca",
    "Sc", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn",
    "Ga", "Ge", "As", "Se", "Br", "Kr", "Rb", "Sr", "Y", "Zr",
    "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd", "In", "Sn",
    "Sb", "Te", "I", "Xe", "Cs", "Ba", "La", "Ce", "Pr", "Nd",
    "Pm", "Sm", "Eu", "Gd", "Tb", "Dy", "Ho", "Er", "Tm", "Yb",
    "Lu", "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt", "Au", "Hg",
    "Tl", "Pb", "Bi", "Po", "At", "Rn", "Fr", "Ra", "Ac", "Th",
    "Pa", "U", "Np", "Pu", "Am", "Cm", "Bk", "Cf", "Es", "Fm",
    "Md", "No", "Lr", "Rf", "Db", "Sg", "Bh", "Hs", "Mt", "Ds",
    "Rg", "Cn", "Nh", "Fl", "Mc", "Lv", "Ts", "Og",
]

HARTREE_IN_EV = 27.211386245988
ANGSTROM_IN_BOHR = 1.0 / 0.529177210903


def get_Z(s: str) -> int:
    """Element symbol or numeric string -> nuclear charge
    (reference: get_Z, src/general/elements.cpp)."""
    s = s.strip()
    if not s:
        return 0
    try:
        return int(s)
    except ValueError:
        pass
    for Z, sym in enumerate(SYMBOLS):
        if sym.lower() == s.lower():
            return Z
    raise ValueError(f"unknown element '{s}'")
