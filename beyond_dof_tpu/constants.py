"""Physical constants (cgs units) and unit helpers.

TPU-native rebuild of the reference constants layer
(ref: tensorflow_recon/constants.py:79-95). Two wavelength conventions coexist
in the reference and are both preserved here:

* ``wavelength(energy_kev)`` — exact cgs formula (ref constants.py:93-95).
* ``wavelength_nm(energy_ev) = 1240 / energy_ev`` — the convention actually
  used in every propagator (ref tensorflow_recon/util.py:371).
"""

AVOGADRO_NUMBER = 6.02214129e+23
BOLTZMANN_CONSTANT = 1.3806488e-16
CLASSICAL_ELECTRON_RADIUS = 2.8179402894e-13
ELECTRONIC_CHARGE = 4.80320425e-10
ELECTRON_VOLT = 1.602176565e-9
ELECTRON_MASS = 9.10938188e-28
FINE_STRUCTURE_CONSTANT = 7.2973525698e-3
PLANCK_CONSTANT = 6.58211928e-19  # reduced, keV*s
PROTON_MASS = 1.67261777e-24
SPEED_OF_LIGHT = 299792458e+2
THOMPSON_CROSS_SECTION = 6.652458734e-25
PI = 3.14159265359


def wavelength(energy_kev):
    """Wavelength [cm] of light with the given energy [keV] (exact cgs)."""
    return 2 * PI * PLANCK_CONSTANT * SPEED_OF_LIGHT / energy_kev


def wavelength_nm(energy_ev):
    """Wavelength [nm] using the 1240/E(eV) convention of the propagators."""
    return 1240. / energy_ev
