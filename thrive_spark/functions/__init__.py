"""Scalar function banks (string/date/math/array/map/json/hash) and
vector math helpers shared by the similarity operators."""
