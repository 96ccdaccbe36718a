"""Pure-Python shim for the ``pulp`` MIP-modelling API surface the reference
uses (``distribution_based/discovery.py:190-241``).

The reference's "correlation clustering ILP" has NO constraints — only a
separable binary objective: minimize sum(x_ij over +edges) +
sum(1 - x_ij over -edges).  With no coupling between variables, the exact
optimum is componentwise: a variable with positive objective coefficient
takes its lower bound, negative coefficient its upper bound, and a variable
absent from the objective defaults to its lower bound (CBC's behaviour).
This shim solves that class of problems EXACTLY — it is not a general MIP
solver, and raises if a constraint is ever added.
"""

LpMinimize = 1
LpMaximize = -1
LpInteger = "Integer"
LpContinuous = "Continuous"


class LpVariable:
    def __init__(self, name=None, lowBound=None, upBound=None, cat=None):
        self.name = name
        self.lowBound = 0 if lowBound is None else lowBound
        self.upBound = upBound
        self.cat = cat
        self.varValue = None

    # arithmetic lifts to affine expressions
    def _expr(self):
        return LpAffineExpression({self: 1.0}, 0.0)

    def __add__(self, other):
        return self._expr() + other

    __radd__ = __add__

    def __sub__(self, other):
        return self._expr() - other

    def __rsub__(self, other):
        return (-1.0) * self._expr() + other

    def __mul__(self, k):
        return self._expr() * k

    __rmul__ = __mul__

    def __neg__(self):
        return (-1.0) * self._expr()


class LpAffineExpression:
    def __init__(self, terms=None, constant=0.0):
        self.terms = dict(terms or {})
        self.constant = constant

    def _coerce(self, other):
        if isinstance(other, LpAffineExpression):
            return other
        if isinstance(other, LpVariable):
            return other._expr()
        return LpAffineExpression({}, float(other))

    def __add__(self, other):
        o = self._coerce(other)
        terms = dict(self.terms)
        for v, c in o.terms.items():
            terms[v] = terms.get(v, 0.0) + c
        return LpAffineExpression(terms, self.constant + o.constant)

    __radd__ = __add__

    def __sub__(self, other):
        return self + (-1.0) * self._coerce(other)

    def __rsub__(self, other):
        return self._coerce(other) + (-1.0) * self

    def __mul__(self, k):
        k = float(k)
        return LpAffineExpression({v: c * k for v, c in self.terms.items()}, self.constant * k)

    __rmul__ = __mul__


def lpSum(items):
    total = LpAffineExpression()
    for item in items:
        total = total + item
    return total


class PULP_CBC_CMD:
    def __init__(self, msg=True, **kwargs):
        self.msg = msg


class LpProblem:
    def __init__(self, name="problem", sense=LpMinimize):
        self.name = name
        self.sense = sense
        self.objective = LpAffineExpression()

    def setObjective(self, expr):
        if isinstance(expr, LpVariable):
            expr = expr._expr()
        self.objective = expr

    def __iadd__(self, other):
        # pulp overloads += for both objective and constraints; the reference
        # only ever sets an objective (via setObjective), so any constraint
        # is out of this shim's scope
        raise NotImplementedError("refshim pulp: constraints not supported")

    def variables(self):
        return sorted(self.objective.terms.keys(), key=lambda v: v.name or "")

    def solve(self, solver=None):
        for v, coeff in self.objective.terms.items():
            if self.sense == LpMinimize:
                take_upper = coeff < 0
            else:
                take_upper = coeff > 0
            if take_upper and v.upBound is not None:
                v.varValue = float(v.upBound)
            else:
                v.varValue = float(v.lowBound)
        return 1  # LpStatusOptimal
