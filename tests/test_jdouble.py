"""jdouble.py — the legacy (Java <= 18) Double.toString digit port — pinned
against the LIVE JVM (the same JVM Spark runs on): a tiny Java helper is
compiled at test time (javac ships with the JDK here; skipped without it)
and fed deterministic fuzz batches covering every code path: integer fast
path with insignificant-digit rounding, int/long machine paths (exclusive
high, m-overflow), FDBigInteger path (inclusive high — the 1e23 boundary
case), subnormals, powers of two, short-decimal midpoints.

No Spark session — this is the entropy-free layer below the SQLite
dialect's dnorm; the Spark-side contract (dnorm == normalize_number) is
pinned separately in tests/test_sqlite_side.py."""

import os
import random
import shutil
import struct
import subprocess

import pytest

from data_diff_spark.jdouble import java_double_decimal, java_double_digits

_JAVA_SRC = """
import java.io.*;
public class ToStrPin {
    public static void main(String[] a) throws Exception {
        BufferedReader r = new BufferedReader(new InputStreamReader(System.in));
        PrintWriter w = new PrintWriter(new BufferedWriter(new OutputStreamWriter(System.out)));
        String line;
        while ((line = r.readLine()) != null) {
            long bits = Long.parseUnsignedLong(line.trim(), 16);
            w.println(Double.toString(Double.longBitsToDouble(bits)));
        }
        w.flush();
    }
}
"""


@pytest.fixture(scope="module")
def jvm_tostring(tmp_path_factory):
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("no JDK available for the Double.toString oracle")
    d = tmp_path_factory.mktemp("jdtoa")
    (d / "ToStrPin.java").write_text(_JAVA_SRC)
    r = subprocess.run(["javac", str(d / "ToStrPin.java")], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"javac failed: {r.stderr[:200]}")

    def run(values):
        hexes = "\n".join(
            format(struct.unpack("<Q", struct.pack("<d", v))[0], "016X")
            for v in values)
        out = subprocess.run(["java", "-cp", str(d), "ToStrPin"],
                             input=hexes, capture_output=True, text=True,
                             check=True)
        return out.stdout.splitlines()

    return run


def _parse(s):
    """Java toString -> (digits, dec_exp) with value = 0.<digits>*10^exp."""
    if s.startswith("-"):
        s = s[1:]
    if "E" in s:
        mant, e = s.split("E")
        ip, fp = mant.split(".")
        digits = (ip + fp).lstrip("0")
        dec_exp = int(e) + len(ip)
    else:
        ip, fp = s.split(".")
        digits = ip + fp
        dec_exp = len(ip)
        stripped = digits.lstrip("0")
        dec_exp -= len(digits) - len(stripped)
        digits = stripped
    digits = digits.rstrip("0") or "0"
    return (digits, 1) if digits == "0" else (digits, dec_exp)


def _fuzz_values(seed, n):
    rng = random.Random(seed)
    vals = [1e23, 1.5, 5e-7, 5e-324, 1e16, 2.0**53, 2.0**53 + 2,
            123456789012345678.0, 9.9e31, 1e300, 1e-300, 2.0**62, 2.0**63,
            float.fromhex("0x1.0p-1022"), 0.1, 0.2, 0.3, 1 / 3, 2 / 3]
    for _ in range(n):
        b = rng.getrandbits(64) & ~(1 << 63)
        x = struct.unpack("<d", struct.pack("<Q", b))[0]
        if x == x and x not in (0.0, float("inf")):
            vals.append(x)
    for lo, hi in [(-7, 7), (7, 20), (15, 32), (-320, -7)]:
        for _ in range(n // 4):
            vals.append(rng.uniform(1, 10) * 10.0 ** rng.randint(lo, hi))
    for _ in range(n // 4):
        k = rng.randrange(1, 10 ** rng.randrange(1, 16))
        vals.append(float(f"{k}e{rng.randrange(-10, 10)}"))
    for _ in range(n // 4):
        vals.append(float(rng.getrandbits(rng.randrange(53, 64))))
    return [abs(v) for v in vals if v and v == v and abs(v) != float("inf")]


def test_digits_match_live_jvm(jvm_tostring):
    vals = _fuzz_values(20260816, 4000)
    got_java = jvm_tostring(vals)
    bad = [
        (v, java_double_digits(v), js)
        for v, js in zip(vals, got_java)
        if java_double_digits(v) != _parse(js)
    ]
    assert not bad, bad[:5]


def test_known_legacy_quirks():
    # 1e23 sits exactly on its upper half-ulp boundary; the legacy loop's
    # strict comparison rejects the short form (JDK-4511638)
    assert java_double_digits(1e23) == ("9999999999999999", 23)
    # shortest-repr (Python) uses 17 digits here; Java agrees
    assert java_double_digits(1.2345678901234568e17) == ("12345678901234568", 18)
    # integer fast path, exact digits
    assert java_double_digits(1e16) == ("1", 17)
    assert java_double_digits(1.5) == ("15", 1)


def test_decimal_wrapper_sign_zero_and_range():
    from decimal import Decimal

    assert java_double_decimal(0.0) == 0
    assert java_double_decimal(-1.5) == Decimal("-1.5")
    assert java_double_decimal(1e23) == Decimal("99999999999999990000000")
    # full double range without InvalidOperation (the r10 ADVICE abort)
    assert java_double_decimal(1.7e308) > 0
    assert java_double_decimal(5e-324) > 0
