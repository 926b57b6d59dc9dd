"""Port of the reference unit tests (erased-cells src/*, see SURVEY.md §5.1)
to pytest over the pure-numpy kernel. No Spark here — these pin the
semantics the Spark tile UDFs must reproduce.
"""

import numpy as np
import pytest

from erased_cells_spark.cells import (
    CellBuffer,
    CellType,
    CellValue,
    Mask,
    MaskedCellBuffer,
    NarrowingError,
    NoData,
    ParseError,
)

ALL = list(CellType)


# ---------------------------------------------------------------- CellType --
class TestCellType:
    def test_union_basics(self):
        # reflexivity / symmetry / widening (src/ctype.rs:188-207)
        assert CellType.UInt8.union(CellType.UInt8) == CellType.UInt8
        assert CellType.Float32.union(CellType.Float32) == CellType.Float32
        assert CellType.Int16.union(CellType.Float32) == CellType.Float32
        assert CellType.Float32.union(CellType.Int16) == CellType.Float32
        assert CellType.UInt8.union(CellType.UInt16) == CellType.UInt16
        assert CellType.Int32.union(CellType.Float32) == CellType.Float64

    # Full 10×10 matrix from SURVEY.md §1.3 (derived from src/ctype.rs:99-126).
    UNION_MATRIX = {
        "UInt8":   "UInt8 UInt16 UInt32 UInt64 Int16 Int16 Int32 Int64 Float32 Float64",
        "UInt16":  "UInt16 UInt16 UInt32 UInt64 Int32 Int32 Int32 Int64 Float32 Float64",
        "UInt32":  "UInt32 UInt32 UInt32 UInt64 Int64 Int64 Int64 Int64 Float64 Float64",
        "UInt64":  "UInt64 UInt64 UInt64 UInt64 Float64 Float64 Float64 Float64 Float64 Float64",
        "Int8":    "Int16 Int32 Int64 Float64 Int8 Int16 Int32 Int64 Float32 Float64",
        "Int16":   "Int16 Int32 Int64 Float64 Int16 Int16 Int32 Int64 Float32 Float64",
        "Int32":   "Int32 Int32 Int64 Float64 Int32 Int32 Int32 Int64 Float64 Float64",
        "Int64":   "Int64 Int64 Int64 Float64 Int64 Int64 Int64 Int64 Float64 Float64",
        "Float32": "Float32 Float32 Float64 Float64 Float32 Float32 Float64 Float64 Float32 Float64",
        "Float64": "Float64 Float64 Float64 Float64 Float64 Float64 Float64 Float64 Float64 Float64",
    }

    @pytest.mark.parametrize("a", ALL, ids=str)
    def test_union_full_matrix(self, a):
        expected = self.UNION_MATRIX[str(a)].split()
        for b, exp in zip(ALL, expected):
            assert a.union(b) == CellType.parse(exp), f"{a} ∪ {b}"

    @pytest.mark.parametrize("a", ALL, ids=str)
    @pytest.mark.parametrize("b", ALL, ids=str)
    def test_union_symmetric_and_fit(self, a, b):
        assert a.union(b) == b.union(a)
        assert a.can_fit_into(b) == (a.union(b) == b)

    def test_is_integral_signed(self):
        assert CellType.UInt8.is_integral and CellType.UInt16.is_integral
        assert not CellType.Float32.is_integral
        assert not CellType.Float64.is_integral
        assert not CellType.UInt64.is_signed
        assert CellType.Int8.is_signed
        assert CellType.Float32.is_signed  # floats count as signed

    def test_size(self):
        sizes = {"UInt8": 1, "Int8": 1, "UInt16": 2, "Int16": 2, "UInt32": 4,
                 "Int32": 4, "UInt64": 8, "Int64": 8, "Float32": 4, "Float64": 8}
        for name, n in sizes.items():
            assert CellType.parse(name).size_of == n

    @pytest.mark.parametrize("ct", ALL, ids=str)
    def test_min_max_constants(self, ct):
        if ct.is_integral:
            info = np.iinfo(ct.dtype)
        else:
            info = np.finfo(ct.dtype)  # finite extremes, not "tiny"
        assert ct.min_value() == CellValue(ct.dtype.type(info.min))
        assert ct.max_value() == CellValue(ct.dtype.type(info.max))

    @pytest.mark.parametrize("ct", ALL, ids=str)
    def test_string_round_trip(self, ct):
        assert CellType.parse(str(ct)) == ct

    def test_parse_error(self):
        with pytest.raises(ParseError):
            CellType.parse("UInt57")

    @pytest.mark.parametrize("ct", ALL, ids=str)
    def test_zero_one(self, ct):
        assert ct.one() + ct.zero() == ct.one()

    def test_declaration_order(self):
        assert [str(c) for c in ALL] == [
            "UInt8", "UInt16", "UInt32", "UInt64",
            "Int8", "Int16", "Int32", "Int64", "Float32", "Float64",
        ]


# --------------------------------------------------------------- CellValue --
class TestCellValue:
    @pytest.mark.parametrize("ct", ALL, ids=str)
    def test_cell_type_and_get(self, ct):
        v = ct.dtype.type(0)
        cv = CellValue(v)
        assert cv.cell_type == ct
        assert cv.get(ct) == v
        assert cv.get(CellType.Float64) == np.float64(v)

    def test_convert(self):
        assert CellValue(np.uint8(43)).convert(CellType.Int16).v == np.int16(43)
        with pytest.raises(NarrowingError):
            CellValue(np.float32(3.11111)).convert(CellType.Int32)
        got = CellValue(np.float32(3.11111)).convert(CellType.Float32)
        assert got.cell_type == CellType.Float32
        got = CellValue(np.uint16(33)).convert(CellType.Float32)
        assert got.cell_type == CellType.Float32 and got.v == 33.0

    def test_neg_table(self):
        cases = [
            (np.uint8(1), CellType.Int16, -1),
            (np.uint16(1), CellType.Int32, -1),
            (np.uint32(1), CellType.Float64, -1.0),
            (np.uint64(1), CellType.Float64, -1.0),
            (np.int8(1), CellType.Int8, -1),
            (np.int16(1), CellType.Int16, -1),
            (np.float32(1.0), CellType.Float32, -1.0),
            (np.float64(1.0), CellType.Float64, -1.0),
        ]
        for v, target_ct, expect in cases:
            r = -CellValue(v)
            assert r.cell_type == target_ct, v.dtype
            assert r.v == expect

    @pytest.mark.parametrize(
        "mk", [np.uint8, np.uint16, np.float32, np.float64], ids=str
    )
    def test_binops(self, mk):
        l, r = CellValue(mk(1)), CellValue(mk(2))
        assert l + r == CellValue(np.float64(3.0))
        assert l + 2 == CellValue(np.float64(3.0))
        assert l - r == CellValue(np.float64(-1.0))
        assert r - l == CellValue(np.float64(1.0))
        assert l * r == CellValue(np.float64(2.0))
        assert l / r == CellValue(np.float64(0.5))
        assert r / l == CellValue(np.float64(2.0))
        # result type is ALWAYS Float64 (src/value.rs:199-217)
        assert (l + r).cell_type == CellType.Float64

    def test_cross_type_equality_and_nan(self):
        assert CellValue(np.float64(3.0)) == CellValue(np.float32(3.0))
        assert CellValue(np.uint8(3)) == CellValue(np.int64(3))
        # NaN == NaN under total order — NODATA sentinel keystone
        assert CellValue(np.float64(np.nan)) == CellValue(np.float64(np.nan))
        assert CellValue(np.float32(np.nan)) == CellValue(np.float32(np.nan))

    def test_total_order(self):
        assert CellValue(np.float64(-0.0)) < CellValue(np.float64(0.0))
        assert CellValue(np.float64(np.inf)) < CellValue(np.float64(np.nan))
        assert CellValue(np.uint8(1)) < CellValue(np.float32(1.5))


# -------------------------------------------------------------- CellBuffer --
def bigger(ct: CellType):
    """All cell types `ct` can widen into (reference bigger(), buffer.rs:457-459)."""
    return [o for o in ALL if ct.can_fit_into(o)]


class TestCellBuffer:
    @pytest.mark.parametrize("ct", ALL, ids=str)
    def test_ctors_and_round_trip(self, ct):
        buf = CellBuffer.from_vec(range(9), ct)
        assert len(buf) == 9 and buf.cell_type == ct
        raw = buf.to_bytes()
        back = CellBuffer.from_bytes(raw, ct)
        assert back == buf
        assert CellBuffer.with_defaults(4, ct).get(0) == ct.zero()
        filled = CellBuffer.fill(3, ct.one())
        assert filled.get(2) == ct.one() and filled.cell_type == ct

    @pytest.mark.parametrize("ct", ALL, ids=str)
    def test_put_get(self, ct):
        buf = CellBuffer.with_defaults(5, ct)
        buf.put(2, ct.one())
        assert buf.get(2) == ct.one()
        if ct != CellType.Float64:
            with pytest.raises(NarrowingError):
                buf.put(0, CellValue(np.float64(0.5)))

    @pytest.mark.parametrize("ct", ALL, ids=str)
    def test_convert_widening(self, ct):
        buf = CellBuffer.from_vec([0, 1, 2], ct)
        for target in bigger(ct):
            conv = buf.convert(target)
            assert conv.cell_type == target
            assert list(conv.data.astype(np.float64)) == [0.0, 1.0, 2.0]
        for target in ALL:
            if target not in bigger(ct):
                with pytest.raises(NarrowingError):
                    buf.convert(target)

    def test_min_max(self):
        buf = CellBuffer.from_vec(
            np.array([-1.0, 3.0, 2000.0, -5555.5], dtype=np.float64)
        )
        lo, hi = buf.min_max()
        assert lo == CellValue(np.float64(-5555.5))
        assert hi == CellValue(np.float64(2000.0))

    @pytest.mark.parametrize("ct", ALL, ids=str)
    def test_min_max_empty_inverted(self, ct):
        lo, hi = CellBuffer.with_defaults(0, ct).min_max()
        assert lo == ct.max_value() and hi == ct.min_value()

    def test_quick_example(self):
        # examples/quick.rs:5-11
        v1 = CellBuffer.from_vec([1, 2, 3], CellType.UInt8)
        v2 = CellBuffer.from_vec([2, 4, 6], CellType.UInt16)
        r = (v1 / v2) * 0.5
        assert r.cell_type == CellType.Float64
        assert r == CellBuffer.from_vec(
            np.array([0.25, 0.25, 0.25], dtype=np.float64)
        )

    @pytest.mark.parametrize("a", ALL, ids=str)
    @pytest.mark.parametrize("b", ALL, ids=str)
    def test_binop_all_pairs(self, a, b):
        # src/buffer.rs:595-614: fill(3, one_a) ⊕ fill(3, two_b), all 4 ops
        lhs = CellBuffer.fill(3, a.one())
        two = CellValue(b.dtype.type(2))
        rhs = CellBuffer.fill(3, two)
        for op, expect in [
            (lhs + rhs, 3.0), ((lhs - rhs), -1.0),
            (lhs * rhs, 2.0), (lhs / rhs, 0.5),
        ]:
            assert op.cell_type == CellType.Float64
            assert list(op.data) == [expect] * 3

    def test_binop_zip_truncates(self):
        a = CellBuffer.from_vec([1, 2, 3], CellType.UInt8)
        b = CellBuffer.from_vec([1, 1], CellType.UInt8)
        assert list((a + b).data) == [2.0, 3.0]

    def test_scalar_ops(self):
        a = CellBuffer.from_vec([1, 2, 3], CellType.UInt8)
        assert list((a + 1).data) == [2.0, 3.0, 4.0]
        assert list((a * 2.0).data) == [2.0, 4.0, 6.0]
        assert list((a - CellValue(np.uint8(1))).data) == [0.0, 1.0, 2.0]
        assert list((a / 2).data) == [0.5, 1.0, 1.5]

    def test_neg_buffer(self):
        assert (-CellBuffer.from_vec([1, 2], CellType.UInt8)).cell_type == CellType.Int16
        assert (-CellBuffer.from_vec([1, 2], CellType.UInt16)).cell_type == CellType.Int32
        assert (-CellBuffer.from_vec([1, 2], CellType.UInt32)).cell_type == CellType.Float64
        assert (-CellBuffer.from_vec([1, 2], CellType.Int32)).cell_type == CellType.Int32
        assert list((-CellBuffer.from_vec([1, 2], CellType.UInt8)).data) == [-1, -2]

    def test_extend(self):
        buf = CellBuffer.from_vec([1, 2], CellType.UInt8)
        buf.extend([CellValue(np.uint16(3)), CellValue(np.uint16(4))])
        assert list(buf.data) == [1, 2, 3, 4] and buf.cell_type == CellType.UInt8
        with pytest.raises(NarrowingError):
            buf.extend([CellValue(np.int32(300))])  # out of u8 range

    def test_from_cell_values(self):
        empty = CellBuffer.from_cell_values([])
        assert empty.cell_type == CellType.UInt8 and len(empty) == 0
        got = CellBuffer.from_cell_values(
            [CellValue(np.float32(1.0)), CellValue(np.uint8(2))]
        )
        assert got.cell_type == CellType.Float32 and list(got.data) == [1.0, 2.0]

    def test_nan_buffer_equals_itself(self):
        # src/buffer.rs:624-635
        data = np.array([np.nan, 1.0, np.nan, 2.0], dtype=np.float64)
        a, b = CellBuffer.from_vec(data.copy()), CellBuffer.from_vec(data.copy())
        assert a == b

    def test_ordering(self):
        # src/buffer.rs:638-672
        u8 = CellType.UInt8
        assert CellBuffer.from_vec([1, 2, 3], u8) < CellBuffer.from_vec([2, 3, 4], u8)
        # element-wise beats length: [1,2,3] < [2,3]
        assert CellBuffer.from_vec([1, 2, 3], u8) < CellBuffer.from_vec([2, 3], u8)
        # length tie-break on equal prefix
        assert CellBuffer.from_vec([1, 2], u8) < CellBuffer.from_vec([1, 2, 0], u8)
        # cross-type: ordinal ordering regardless of values
        assert CellBuffer.from_vec([9, 9], CellType.UInt8) < CellBuffer.from_vec(
            [0], CellType.Float64
        )
        # NaN-prefix compare: NaN > inf under total order
        a = CellBuffer.from_vec(np.array([np.nan, 0.0]))
        b = CellBuffer.from_vec(np.array([np.inf, 99.0]))
        assert a > b

    def test_repr_elision(self):
        r = repr(CellBuffer.from_vec(range(12), CellType.UInt8))
        assert r.startswith("UInt8CellBuffer([") and "(2 more)" in r


# --------------------------------------------------------------------- Mask --
class TestMask:
    def test_counts_set_all(self):
        m = Mask.fill(5, True)
        assert m.counts() == (5, 0) and m.all(True)
        m.put(2, False)
        assert m.counts() == (4, 1) and not m.all(True) and not m.all(False)

    def test_not_and_or(self):
        a = Mask([True, True, False, False])
        b = Mask([True, False, True, False])
        assert (~a) == Mask([False, False, True, True])
        assert (a & b) == Mask([True, False, False, False])
        assert (a | b) == Mask([True, True, True, False])

    def test_round_trip_bytes(self):
        m = Mask([True, False, True])
        assert Mask.from_bytes(m.to_bytes()) == m


# ------------------------------------------------------------------- NoData --
class TestNoData:
    def test_defaults(self):
        # integers → MIN (NOT zero... except unsigned where MIN==0); floats → NaN
        assert NoData.default(CellType.UInt8).sentinel() == 0
        assert NoData.default(CellType.Int16).sentinel() == np.int16(-32768)
        assert NoData.default(CellType.Int64).sentinel() == np.iinfo(np.int64).min
        assert np.isnan(NoData.default(CellType.Float32).sentinel())
        assert np.isnan(NoData.default(CellType.Float64).sentinel())

    def test_is_nodata_nan_safe(self):
        nd = NoData.default(CellType.Float64)
        arr = np.array([1.0, np.nan, 3.0, np.nan])
        assert list(nd.is_nodata(arr)) == [False, True, False, True]
        nd3 = NoData.value(CellType.Float64, 3.0)
        assert list(nd3.is_nodata(arr)) == [False, False, True, False]
        none = NoData.none(CellType.Float64)
        assert not none.is_nodata(arr).any()


# --------------------------------------------------------- MaskedCellBuffer --
class TestMaskedCellBuffer:
    def test_length_assert(self):
        with pytest.raises(ValueError):
            MaskedCellBuffer(CellBuffer.from_vec([1], CellType.UInt8), Mask.fill(2, True))

    def test_nan_nodata_ingest(self):
        # src/masked/masked_buffer.rs:413-425
        v = [1.0, np.nan, 3.0, np.nan]
        m = MaskedCellBuffer.from_vec_with_nodata(v, NoData.default(CellType.Float64))
        assert list(m.mask.data) == [True, False, True, False]
        m2 = MaskedCellBuffer.from_vec_with_nodata(
            v, NoData.value(CellType.Float64, 3.0)
        )
        assert list(m2.mask.data) == [True, True, False, True]

    def test_get_masked(self):
        m = MaskedCellBuffer.from_vec_with_nodata(
            [1.0, np.nan, 3.0], NoData.default(CellType.Float64)
        )
        assert m.get_masked(0) == CellValue(np.float64(1.0))
        assert m.get_masked(1) is None
        assert m.counts() == (2, 1)

    def test_neg_round_trip_i16_min_sentinel(self):
        # masked_alt fixture: u8 i, mask i%2==0, len 9; -buf → i16;
        # egress with NoData::Default ⇒ masked lanes = i16::MIN
        # (src/masked/masked_buffer.rs:464-479)
        m = MaskedCellBuffer.fill_with_mask_via(
            9, CellType.UInt8, lambda i: (i, i % 2 == 0)
        )
        neg = -m
        assert neg.cell_type == CellType.Int16
        out = neg.to_vec_with_nodata(CellType.Int16, NoData.default(CellType.Int16))
        MIN = np.iinfo(np.int16).min
        assert list(out) == [0, MIN, -2, MIN, -4, MIN, -6, MIN, -8]

    def test_mask_aware_min_max(self):
        # masked_minmax fixture (src/masked/masked_buffer.rs:481-485)
        m = MaskedCellBuffer.fill_with_mask_via(
            9, CellType.UInt8, lambda i: (i, i not in (0, 8))
        )
        lo, hi = m.min_max()
        assert lo == CellValue(np.uint8(1)) and hi == CellValue(np.uint8(7))

    @pytest.mark.parametrize("ct", ALL, ids=str)
    def test_all_masked_inverted_extremes(self, ct):
        m = MaskedCellBuffer(
            CellBuffer.from_vec([0, 1], ct), Mask.fill(2, False)
        )
        lo, hi = m.min_max()
        assert lo == ct.max_value() and hi == ct.min_value()

    @pytest.mark.parametrize("opname", ["add", "sub", "mul", "div"])
    def test_binop_mask_propagation(self, opname):
        # src/masked/masked_buffer.rs:512-531: new_mask = lmask & rmask;
        # raw values computed regardless of mask.
        import operator

        op = {"add": operator.add, "sub": operator.sub,
              "mul": operator.mul, "div": operator.truediv}[opname]
        l = MaskedCellBuffer.from_pairs(
            [(2, True), (2, False), (2, True), (2, False)], CellType.UInt8
        )
        r = MaskedCellBuffer.from_pairs(
            [(2, True), (2, True), (2, False), (2, False)], CellType.UInt8
        )
        got = op(l, r)
        assert got.cell_type == CellType.Float64
        assert list(got.mask.data) == [True, False, False, False]
        expect = {"add": 4.0, "sub": 0.0, "mul": 4.0, "div": 1.0}[opname]
        assert list(got.buffer.data) == [expect] * 4  # garbage lanes still computed

    def test_scalar_op_preserves_mask(self):
        m = MaskedCellBuffer.fill_with_mask_via(
            6, CellType.UInt8, lambda i: (i, i % 2 == 0)
        )
        got = (m + CellValue(np.uint8(1))) * 2.0
        assert list(got.mask.data) == [True, False] * 3
        assert list(got.buffer.data) == [2.0, 4.0, 6.0, 8.0, 10.0, 12.0]

    def test_masked_example(self):
        # examples/masked.rs:3-23
        buf = MaskedCellBuffer.fill_with_mask_via(
            9, CellType.Float64, lambda i: (float(i), i % 2 == 0)
        )
        ones = MaskedCellBuffer.fill(9, CellValue(np.float64(1.0)))
        got = (buf + ones) * 2.0
        expect = MaskedCellBuffer.fill_with_mask_via(
            9, CellType.Float64, lambda i: ((i + 1.0) * 2.0, i % 2 == 0)
        )
        assert got == expect

    def test_convert_preserves_mask(self):
        m = MaskedCellBuffer.fill_with_mask_via(
            4, CellType.UInt8, lambda i: (i, i % 2 == 0)
        )
        c = m.convert(CellType.Float32)
        assert c.cell_type == CellType.Float32
        assert c.mask == m.mask

    def test_to_vec_ignores_mask_but_with_nodata_applies(self):
        m = MaskedCellBuffer.from_pairs(
            [(1, True), (2, False), (3, True)], CellType.UInt8
        )
        assert list(m.to_vec(CellType.UInt8)) == [1, 2, 3]
        out = m.to_vec_with_nodata(CellType.Int16, NoData.value(CellType.Int16, -1))
        assert list(out) == [1, -1, 3]
        raw = m.to_vec_with_nodata(CellType.Int16, NoData.none(CellType.Int16))
        assert list(raw) == [1, 2, 3]

    def test_extend_and_iter(self):
        m = MaskedCellBuffer.from_pairs([(1, True)], CellType.UInt8)
        m.extend([(2, False)])
        assert len(m) == 2 and m.counts() == (1, 1)
        assert [(int(v.v), b) for v, b in m] == [(1, True), (2, False)]


class TestFromBytesMutability:
    def test_put_after_from_bytes_copies_on_write(self):
        # np.frombuffer views are read-only; the reference's transmuted Vec is
        # mutable — put() must copy-on-write instead of raising
        raw = bytes(CellBuffer.from_vec([1, 2, 3], CellType.UInt8).to_bytes())
        buf = CellBuffer.from_bytes(raw, CellType.UInt8)
        buf.put(1, CellValue(np.uint8(9)))
        assert list(buf.data) == [1, 9, 3]
        assert raw == b"\x01\x02\x03"  # the source payload is untouched

    def test_extend_after_from_bytes(self):
        buf = CellBuffer.from_bytes(b"\x01\x02", CellType.UInt8)
        buf.extend([3])
        assert list(buf.data) == [1, 2, 3]
