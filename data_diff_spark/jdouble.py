"""Faithful Python port of OpenJDK 17 (legacy, pre-JDK-19) FloatingDecimal
BinaryToASCIIBuffer#dtoa — the digit generation behind Double.toString.

Returns (digits, dec_exp) with value = 0.<digits> * 10**dec_exp for a
positive finite double. Ported from the JDK 17 bytecode (javap -c) of
jdk.internal.math.FloatingDecimal; fuzz-verified against the JVM.

Why this exists: Spark's double->decimal cast (normalize.py's
normalize_number, hence every cross-engine checksum over a DOUBLE column)
routes through BigDecimal.valueOf(double) = new BigDecimal(
Double.toString(double)). On Java <= 18 Double.toString is NOT the
shortest round-trip representation: it emits "9.999999999999999E22" for
1e23 (the value sits exactly on its upper half-ulp boundary, and the
legacy loop's strict comparison rejects it) and sometimes 17 digits where
16 round-trip. Python's repr IS shortest (Ryu), so a repr-based mirror
silently diverges from the Spark side for |x| >= 2^53 — this port is the
bit-exact mirror the SQLite dialect's dnorm needs (operators/remote.py).
On Java 19+ (JDK-4511638 fixed) Double.toString becomes shortest-repr and
this module would need a version gate; the container pins Java 17.

Quirks preserved on purpose:
  - int/long machine paths use EXCLUSIVE high (b+m > tenS) while the
    FDBigInteger path uses INCLUSIVE high (b+m >= tenS);
  - machine paths let m overflow (wrap) and force-stop when m <= 0;
  - the first digit's stop flags are discarded when the estimated decimal
    exponent is outside [-3, 8) (scientific notation needs >= 2 digits);
  - final rounding: high-only -> round up; low&&high -> compare 2b vs
    tenS, ties keep even last digit; low-only -> truncate.
"""
import math
import struct
from decimal import Decimal, localcontext

_EXP_SHIFT = 52
_FRACT_HOB = 1 << 52
_SIGNIF_MASK = (1 << 52) - 1

# FloatingDecimal$BinaryToASCIIBuffer.insignificantDigitsNumber (len 64)
_INSIG = [
    0, 0, 0, 0, 1, 1, 1, 2, 2, 2,
    3, 3, 3, 3, 4, 4, 4, 5, 5, 5,
    6, 6, 6, 6, 7, 7, 7, 8, 8, 8,
    9, 9, 9, 9, 10, 10, 10, 11, 11, 11,
    12, 12, 12, 12, 13, 13, 13, 14, 14, 14,
    15, 15, 15, 15, 16, 16, 16, 17, 17, 17,
    18, 18, 18, 19,
]

_N_5_BITS_LEN = 27  # N_5_BITS covers 5^0..5^26


def _n5bits_exact(i):
    # N_5_BITS[i] = bit length of 5^i (table entry 0 is 0); indices past
    # the table fall back to 3*i like the JDK code.
    if i < _N_5_BITS_LEN:
        return 0 if i == 0 else (5 ** i).bit_length()
    return 3 * i


def _estimate_dec_exp(fract_bits, bin_exp):
    d2 = struct.unpack(
        "<d", struct.pack("<Q", 0x3FF0000000000000 | (fract_bits & _SIGNIF_MASK))
    )[0]
    d = (d2 - 1.5) * 0.289529654 + 0.176091259 + bin_exp * 0.301029995663981
    return math.floor(d)


def _wrap(v, w):
    mask = (1 << w) - 1
    half = 1 << (w - 1)
    return ((v + half) & mask) - half


def _roundup(digits):
    """In-place last-digit increment with carry; returns dec_exp bump."""
    i = len(digits) - 1
    if digits[i] == 9:
        while digits[i] == 9 and i > 0:
            digits[i] = 0
            i -= 1
        if digits[i] == 9:
            digits[0] = 1
            return 1
    digits[i] += 1
    return 0


def java_double_digits(x: float):
    """(digits, dec_exp) of Java 17 Double.toString(x) for finite x > 0."""
    bits = struct.unpack("<Q", struct.pack("<d", x))[0]
    fract = bits & _SIGNIF_MASK
    bexp = (bits >> 52) & 0x7FF
    if bexp != 0:
        F = fract | _FRACT_HOB
        nsig = _EXP_SHIFT + 1
        bin_exp = bexp - 1023
    else:
        lz = 64 - fract.bit_length()
        shift = lz - (63 - _EXP_SHIFT)
        F = fract << shift
        bin_exp = (1 - shift) - 1023
        nsig = 64 - lz
    tz = (F & -F).bit_length() - 1
    n_fract_bits = _EXP_SHIFT + 1 - tz
    n_tiny_bits = max(0, n_fract_bits - bin_exp - 1)

    if -21 <= bin_exp <= 62 and n_tiny_bits == 0:
        # developLongDigits: exact integer, drop insignificant digits
        p2 = bin_exp - nsig - 1
        insig = _INSIG[p2] if 1 < p2 < 64 else 0
        v = F << (bin_exp - 52) if bin_exp >= 52 else F >> (52 - bin_exp)
        dec_exp = 0
        if insig:
            pow10 = 10 ** insig
            v, residue = divmod(v, pow10)
            dec_exp = insig
            if residue >= pow10 >> 1:
                v += 1
        s = str(v)
        dec_exp += len(s)
        return s.rstrip("0"), dec_exp

    dec_exp = _estimate_dec_exp(F, bin_exp)
    B5 = max(0, -dec_exp)
    B2 = B5 + n_tiny_bits + bin_exp
    S5 = max(0, dec_exp)
    S2 = S5 + n_tiny_bits
    M5 = B5
    M2 = B2 - nsig
    F >>= tz
    B2 -= n_fract_bits - 1
    common2 = min(B2, S2)
    B2 -= common2
    S2 -= common2
    M2 -= common2
    if n_fract_bits == 1:
        M2 -= 1  # exact power of two: next smaller double is half as far
    if M2 < 0:
        B2 -= M2
        S2 -= M2
        M2 = 0

    b_bits = n_fract_bits + B2 + _n5bits_exact(B5)
    ten_s_bits = S2 + 1 + _n5bits_exact(S5 + 1)
    digits = []

    if b_bits < 64 and ten_s_bits < 64:
        w = 32 if (b_bits < 32 and ten_s_bits < 32) else 64
        b = (F * 5 ** B5) << B2
        s = 5 ** S5 << S2
        m = 5 ** M5 << M2
        tens = s * 10
        q, r = divmod(b, s)
        b = 10 * r
        m = _wrap(m * 10, w)
        low = b < m
        high = _wrap(b + m, w) > tens
        if q == 0 and not high:
            dec_exp -= 1
        else:
            digits.append(q)
        if not (-3 <= dec_exp < 8):
            low = high = False
        while not low and not high:
            q, r = divmod(b, s)
            b = 10 * r
            m = _wrap(m * 10, w)
            if m > 0:
                low = b < m
                high = _wrap(b + m, w) > tens
            else:
                low = high = True
            digits.append(q)
        c = _wrap(_wrap(b << 1, w) - tens, w)
    else:
        # FDBigInteger path (exact); NOTE: high is INCLUSIVE here
        b = F * 5 ** B5 << B2
        s = 5 ** S5 << S2
        m = 10 * 5 ** M5 << M2
        tens = 10 * s
        q, r = divmod(b, s)
        b = r * 10
        low = b < m
        high = b + m >= tens
        if q == 0 and not high:
            dec_exp -= 1
        else:
            digits.append(q)
        if not (-3 <= dec_exp < 8):
            low = high = False
        while not low and not high:
            q, r = divmod(b, s)
            b = r * 10
            m *= 10
            low = b < m
            high = b + m >= tens
            digits.append(q)
        c = 2 * b - tens

    if high:
        if low:
            if c == 0:
                if digits[-1] & 1:
                    dec_exp += _roundup(digits)
            elif c > 0:
                dec_exp += _roundup(digits)
        else:
            dec_exp += _roundup(digits)
    s_out = "".join(map(str, digits)).rstrip("0") or "0"
    return s_out, dec_exp + 1


def java_double_decimal(x: float) -> Decimal:
    """Decimal with exactly BigDecimal.valueOf(x)'s digits (sign applied).

    This is what Spark's cast(double as decimal(38, s)) starts from; the
    caller quantizes to the target scale. Requires finite x."""
    if x == 0.0:
        return Decimal(0)
    digits, dec_exp = java_double_digits(abs(x))
    with localcontext() as ctx:
        ctx.prec = 400  # covers the full double range + any target scale
        d = Decimal(int(digits)).scaleb(dec_exp - len(digits))
    return -d if x < 0 else d
