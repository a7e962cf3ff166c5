"""From-scratch numpy ML kernels (no scipy/sklearn in this environment):
TF-IDF vectorizer, chi² feature selection, one-vs-rest logistic
regression, linear-chain CRF. All deterministic (seeded, fixed-iteration
training) — this removes the reference's nondeterminism surfaces
(SGDClassifier threading, crfsuite internals)."""
