package graft.dml

import org.scalatest.funsuite.AnyFunSuite

/** Python-repr byte compatibility for float rendering in compiled SQL/JSON
  * (parser.py uses json.dumps, whose float formatting is Python repr).
  * Pins the fixed/scientific switchover: fixed while the leading digit's
  * power of ten is in [-4, 16), else lowercase 'e' with signed two-digit
  * exponent — e.g. tol=1e-6 must render "1e-06", never "1.0E-6". */
class PyReprSpec extends AnyFunSuite {
  import Value.pyFloatRepr

  test("plain range renders as Python fixed notation") {
    assert(pyFloatRepr(0.5) == "0.5")
    assert(pyFloatRepr(2.0) == "2.0")
    assert(pyFloatRepr(-3.25) == "-3.25")
    assert(pyFloatRepr(0.01) == "0.01")
    assert(pyFloatRepr(100.0) == "100.0")
    assert(pyFloatRepr(0.0) == "0.0")
  }

  test("boundary of the fixed range matches Python") {
    // Python: repr(1e-4) == '0.0001' (fixed), repr(1e-5) == '1e-05'
    assert(pyFloatRepr(1e-4) == "0.0001")
    assert(pyFloatRepr(1.5e-4) == "0.00015")
    assert(pyFloatRepr(9.99e15) == "9990000000000000.0")
    // Java would render these as 1.0E7-style scientific; Python keeps fixed
    assert(pyFloatRepr(1e7) == "10000000.0")
    assert(pyFloatRepr(12345678.5) == "12345678.5")
  }

  test("scientific range uses lowercase e and two-digit signed exponent") {
    assert(pyFloatRepr(1e-6) == "1e-06")
    assert(pyFloatRepr(1.5e-6) == "1.5e-06")
    assert(pyFloatRepr(-2.5e-7) == "-2.5e-07")
    assert(pyFloatRepr(1e16) == "1e+16")
    assert(pyFloatRepr(2.5e20) == "2.5e+20")
    assert(pyFloatRepr(1e100) == "1e+100")
    assert(pyFloatRepr(1.25e-123) == "1.25e-123")
  }

  test("non-finite values render as Python float strings") {
    assert(pyFloatRepr(Double.NaN) == "nan")
    assert(pyFloatRepr(Double.PositiveInfinity) == "inf")
    assert(pyFloatRepr(Double.NegativeInfinity) == "-inf")
  }
}
