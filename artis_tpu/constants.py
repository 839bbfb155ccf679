"""Physical and numerical constants (CGS units).

TPU-native rebuild of the reference constant set (reference: constants.h:1-67).
All values are plain Python floats so they fold into XLA programs as
compile-time constants.
"""

import math

# fundamental constants (cgs)
CLIGHT = 2.99792458e10  # speed of light [cm/s]
CLIGHT_PROP = CLIGHT  # speed used for ray travel (separable for testing)
H = 6.6260755e-27  # Planck constant [erg s]
MSUN = 1.98855e33  # solar mass [g]
LSUN = 3.826e33  # solar luminosity [erg/s]
MH = 1.67352e-24  # hydrogen atom mass [g]
ME = 9.1093897e-28  # electron mass [g]
QE = 4.80325e-10  # elementary charge [statC]
PI = math.pi
EV = 1.6021772e-12  # eV in erg
MEV = 1.6021772e-6  # MeV in erg
DAY = 86400.0  # day in seconds
SIGMA_T = 6.6524e-25  # Thomson cross-section [cm^2]
THOMSON_LIMIT = 1e-2  # below this h*nu/(me c^2), e-scattering is Thomson
PARSEC = 3.0857e18  # parsec [cm]
KB = 1.38064852e-16  # Boltzmann constant [erg/K]
STEBO = 5.670400e-5  # Stefan-Boltzmann [erg cm^-2 s^-1 K^-4]
SAHACONST = 2.0706659e-16  # Saha constant
EULERGAMMA = 0.5772156649015329

# derived numerical constants
CLIGHTSQUARED = 8.9875518e20
TWOOVERCLIGHTSQUARED = 2.2253001e-21
TWOHOVERCLIGHTSQUARED = 1.4745007e-47
CLIGHTSQUAREDOVERTWOH = 6.7819570e46
ONEOVERH = 1.509188961e26
HOVERKB = 4.799243681748932e-11
FOURPI = 1.256637061600000e1
ONEOVER4PI = 7.957747153555701e-2
HCLIGHTOVERFOURPI = 1.580764662876770e-17
OSCSTRENGTHCONVERSION = 1.3473837e21

H_IONPOT = 13.5979996 * EV

# van Regemorter approximation constant
C_0 = 5.465e-11

# vector defining the theta=0 direction for escape-direction binning
SYN_DIR = (0.0, 0.0, 1.0)

# electron rest-mass energy [erg]
ME_C2 = ME * CLIGHTSQUARED
