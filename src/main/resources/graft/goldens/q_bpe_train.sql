SELECT CAST("round" AS INTEGER) AS "round", CAST("left" AS VARCHAR) AS "left", CAST("right" AS VARCHAR) AS "right", CAST("freq" AS BIGINT) AS "freq"
FROM (VALUES
(1, 'e', 'r', 4568),
(2, 'i', 'n', 2760),
(3, 'o', 'w', 2747),
(4, 'o', 'r', 2696),
(5, 's', 't', 2676),
(6, 'm', 'er', 1852),
(7, 'a', 't', 1845),
(8, 'l', 'u', 1831),
(9, 'a', 'r', 1758),
(10, 'p', 'ar', 1758),
(11, 'j', 'o', 964),
(12, 'jo', 'in', 964),
(13, 'a', 's', 947),
(14, 'as', 'h', 947),
(15, 'h', 'ash', 947),
(16, 'r', 'ow', 943),
(17, 'at', 'c', 937),
(18, 'atc', 'h', 937),
(19, 'b', 'atch', 937),
(20, 'a', 'n', 936)
) AS t("round", "left", "right", "freq")
ORDER BY "round", "left", "right", "freq"
